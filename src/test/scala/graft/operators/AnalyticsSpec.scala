package graft.operators

import graft.SparkTestBase

/** Analytics operators: per-group top-k semantics on a hand-built table
  * and HLL++ approximate distinct accuracy against the exact count.
  */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("topUsersPerType: rank cut and tie-break by user_id") {
    val counts = Analytics.topUsersPerType(spark, dir)
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    counts.foreach { case (tpe, rows) =>
      assert(rows.length <= 3, s"$tpe returned ${rows.length} rows")
      // descending by n, ties ascending by user_id
      val ordered = rows.sortBy(r => (-r._3, r._2)).toSeq
      assert(rows.toSeq == ordered, s"$tpe rows not in rank order: ${rows.toSeq}")
    }
    assert(counts.nonEmpty)
  }

  test("heavyHitters: exact counts, share, rank cut, and (n desc, key asc) tie order") {
    val df = (Seq.fill(5)(7L) ++ Seq.fill(3)(2L) ++ Seq.fill(3)(9L) ++ Seq(4L))
      .toDF("user_id")
    val out = Analytics.heavyHitters(df, "user_id", topN = 3)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(out == Seq(
      (7L, 5L, 5.0 / 12, 1L), // heaviest
      (2L, 3L, 3.0 / 12, 2L), // 3-way count tie → key ascending
      (9L, 3L, 3.0 / 12, 3L),
    ).map { case (k, n, s, r) =>
      (k, n, BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, r)
    })
  }

  test("funnel: ordered completion only — out-of-order and stalled users don't advance") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    def ev(id: Long, t: String, u: Long, tpe: String) = (id, ts(t), u, tpe, 0.0)
    val events = Seq(
      // user 1 completes all three stages in order
      ev(1, "2024-01-01 10:00:00", 1, "signup"),
      ev(2, "2024-01-01 10:01:00", 1, "click"),
      ev(3, "2024-01-01 10:02:00", 1, "purchase"),
      // user 2: purchase BEFORE the click — reaches stage 2 only
      ev(4, "2024-01-01 10:00:00", 2, "signup"),
      ev(5, "2024-01-01 10:02:00", 2, "click"),
      ev(6, "2024-01-01 10:01:00", 2, "purchase"),
      // user 3: click before signup and nothing after — stage 1 only
      ev(7, "2024-01-01 09:00:00", 3, "click"),
      ev(8, "2024-01-01 10:00:00", 3, "signup"),
      // user 4 never signs up — counts nowhere
      ev(9, "2024-01-01 10:00:00", 4, "click"),
      ev(10, "2024-01-01 10:01:00", 4, "purchase"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.funnel(events, Seq("signup", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "signup", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("weeklyRetention: cohort by first week, offsets count distinct active users") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // epoch week boundary: 1970-01-01 is a Thursday but weeks here are
    // plain day//7 buckets — 2024-01-04 starts week 2818 (day 19726)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0), // u1 cohort w0
      (2L, ts("2024-01-09 10:00:00"), 1L, "a", 0.0), // u1 active w0+1
      (3L, ts("2024-01-09 11:00:00"), 1L, "b", 0.0), // same week — no double count
      (4L, ts("2024-01-16 10:00:00"), 1L, "a", 0.0), // u1 active w0+2
      (5L, ts("2024-01-09 10:00:00"), 2L, "a", 0.0), // u2 cohort w0+1
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.weeklyRetention(events)
      .as[(Long, Long, Long)].collect().toSet
    val w0 = 19723L / 7 // 2024-01-01 is epoch day 19723
    val w1 = 19731L / 7
    assert(got == Set((w0, 0L, 1L), (w0, 1L, 1L), (w0, 2L, 1L), (w1, 0L, 1L)))
  }

  test("dailyAnomalies: NULL until 2 baseline days and on flat baselines; spike scores") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // one event type, daily counts 2,2,2,2,8 — flat baseline until the
    // spike day, whose own baseline {2,2,2,2} is flat too (stddev 0 ⇒
    // NULL, not infinity); then 2,4 gives a real z on the last day
    val rows = collection.mutable.ListBuffer[(Long, Timestamp, Long, String, Double)]()
    var id = 0L
    def day(d: Int, n: Int): Unit = (1 to n).foreach { i =>
      id += 1; rows += ((id, ts(f"2024-01-${d}%02d 10:00:$i%02d"), 1L, "view", 0.0))
    }
    day(1, 2); day(2, 2); day(3, 2); day(4, 2); day(5, 8); day(6, 4)
    val got = Analytics.dailyAnomalies(
      rows.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .as[(String, Timestamp, Long, Long, Option[Double])]
      .collect().toSeq.sortBy(_._2.getTime)
    assert(got.map(_._3) == Seq(2L, 2L, 2L, 2L, 8L, 4L))
    assert(got.map(_._4) == Seq(0L, 1L, 2L, 3L, 4L, 5L)) // baseline grows
    assert(got(0)._5.isEmpty, "no baseline")
    assert(got(1)._5.isEmpty, "single-day baseline: stddev undefined")
    assert(got(4)._5.isEmpty, "flat baseline: stddev 0 must be NULL not inf")
    // day 6 baseline {2,2,2,2,8}: mean 3.2, stddev_samp sqrt(7.2)
    val want = BigDecimal((4.0 - 3.2) / math.sqrt(7.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(5)._5.contains(want))
  }

  test("userEventSequences: head-of-history cut, (ts, event_id) order, totals kept") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: 4 events, maxLen 3 truncates; same-ts tie broken by event_id
      (4L, ts("2024-01-01 10:00:03"), 1L, "d", 0.0),
      (2L, ts("2024-01-01 10:00:01"), 1L, "b", 0.0),
      (3L, ts("2024-01-01 10:00:01"), 1L, "c", 0.0),
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      // user 2: complete history, shorter than maxLen
      (5L, ts("2024-01-01 11:00:00"), 2L, "x", 0.0),
      (6L, ts("2024-01-01 11:00:01"), 2L, "y", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.userEventSequences(events, maxLen = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 4L, 3L, "a|b|c"), // 4 total, first 3 kept, tie 2<3 ⇒ b before c
      (2L, 2L, 2L, "x|y"),
    ))
  }

  test("userEventSequences at sf0.001 equals the rank-window spelling") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, dir, "events")
    val got = Analytics.userEventSequences(events, maxLen = 16)
      .as[(Long, Long, Long, String)].collect().toSet
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val want = events.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 16)
      .groupBy("user_id")
      .agg(count(lit(1)).as("seq_len"),
        array_join(transform(array_sort(collect_list(struct(col("rn"),
          col("event_type")))), e => e.getField("event_type")), "|").as("seq"))
      .join(events.groupBy("user_id").agg(count(lit(1)).as("n_events")), "user_id")
      .select(col("user_id"), col("n_events"), col("seq_len"), col("seq"))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == want)
    assert(got.exists(r => r._3 < r._2), "no truncated history at maxLen=16")
  }

  test("dailyMovingAvg: frame equals a hand-rolled trailing-7-day recompute") {
    val rows = Analytics.dailyMovingAvg(spark, dir)
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (tpe, rs) =>
      val dayIdx = rs.map(r => (r._2.getTime / 86400000L, r._3)).toMap
      rs.foreach { case (_, day, _, avgN) =>
        val d = day.getTime / 86400000L
        val window = (d - 6 to d).flatMap(dayIdx.get)
        val want = BigDecimal(window.sum.toDouble / window.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(avgN - want) < 1e-9, s"$tpe $day: $avgN vs $want")
      }
    }
  }

  test("dailyMovingAvg: frame law holds under a DST session timezone") {
    // a μs-division day index assumes 24h days and breaks under DST;
    // the datediff-based index must keep adjacent local days adjacent
    val zone = java.time.ZoneId.of("America/New_York")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val rows = Analytics.dailyMovingAvg(spark, dir)
        .as[(String, java.sql.Timestamp, Long, Double)].collect()
      assert(rows.nonEmpty)
      rows.groupBy(_._1).foreach { case (tpe, rs) =>
        val byDay = rs.map(r =>
          r._2.toInstant.atZone(zone).toLocalDate.toEpochDay -> r._3).toMap
        rs.foreach { case (_, day, _, avgN) =>
          val d = day.toInstant.atZone(zone).toLocalDate.toEpochDay
          val window = (d - 6 to d).flatMap(byDay.get)
          val want = BigDecimal(window.sum.toDouble / window.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(avgN - want) < 1e-9, s"$tpe $day: $avgN vs $want")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("typeDailyRanks: ranking-function laws over the aggregated set") {
    val rows = Analytics.typeDailyRanks(spark, dir)
      .as[(String, java.sql.Timestamp, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_._4) // by rn
      assert(sorted.map(_._4).toSeq == (1L to rs.length).toSeq, s"$tpe rn not a permutation")
      sorted.foreach { r =>
        assert(r._5 <= r._4, s"$tpe rank > row_number")   // rnk <= rn
        assert(r._6 <= r._5, s"$tpe dense_rank > rank")
        assert(r._8 >= 0.0 && r._8 <= 1.0)
        assert(r._7 >= 1 && r._7 <= 4)
      }
      // percent_rank = (rank-1)/(N-1)
      sorted.foreach(r => assert(math.abs(r._8 -
        BigDecimal((r._5 - 1).toDouble / (rs.length - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9))
    }
  }

  test("dailyDelta: delta and pct_change recompute from consecutive days") {
    val rows = Analytics.dailyDelta(spark, dir)
      .as[(String, java.sql.Timestamp, Long, Option[Long], Option[Double])].collect()
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val ordered = rs.sortBy(_._2.getTime)
      assert(ordered.head._4.isEmpty, s"$tpe first day must have NULL delta")
      ordered.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur._4.contains(cur._3 - prev._3), s"$tpe ${cur._2}")
          val want = BigDecimal((cur._3 - prev._3).toDouble / prev._3)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(cur._5.get - want) < 1e-9, s"$tpe ${cur._2}")
        case _ =>
      }
    }
    assert(rows.nonEmpty)
  }

  test("valueHistogram: bins recount and bound their min/max") {
    val bins = Analytics.valueHistogram(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select("event_type", "value").as[(String, Double)].collect()
    assert(bins.map(_._3).sum == events.length, "bin counts must cover every row")
    bins.foreach { case (tpe, bin, n, mn, mx) =>
      val in = events.filter(e => e._1 == tpe && math.floor(e._2 / 10.0).toLong == bin)
      assert(in.length == n, s"$tpe bin $bin count")
      assert(mn >= bin * 10.0 - 1e-6 && mx < (bin + 1) * 10.0 + 1e-6,
        s"$tpe bin $bin bounds [$mn,$mx]")
      assert(mn <= mx)
    }
  }

  test("approx_count_distinct tracks exact within the configured rsd") {
    val rows = Analytics.approxUserCountsByType(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, approx, exact) =>
      assert(exact > 0)
      val rel = math.abs(approx - exact).toDouble / exact
      // rsd 0.05 → 3 sigma ≈ 15%
      assert(rel <= 0.15, s"$tpe: approx $approx vs exact $exact (rel $rel)")
    }
  }

  test("eventTransitions: per-user pairing, tie-break by event_id, no cross-user pairs") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1: a → b → c (same-ts tie: event 2 before event 3 by id)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 0.0),
      (3L, ts("2024-01-01 10:01:00"), 1L, "c", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b", 0.0),
      // user 2: c alone — contributes NO pair (and no pair c→a across users)
      (4L, ts("2024-01-01 09:00:00"), 2L, "c", 0.0),
      // user 3: a → b again
      (5L, ts("2024-01-01 08:00:00"), 3L, "a", 0.0),
      (6L, ts("2024-01-01 08:30:00"), 3L, "b", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.eventTransitions(events)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L), ("b", "c", 1L)))
  }

  test("slidingDistinctUsers: union-not-sum over the trailing window, clipped at the last day") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // user 1 active days 1 and 2 (and twice on day 1 — no double count);
      // user 2 active day 2 only; nothing after day 2
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-02 10:00:00"), 1L, "view", 0.0),
      (4L, ts("2024-01-02 11:00:00"), 2L, "view", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.slidingDistinctUsers(events, days = 7)
      .as[(Timestamp, Long)].collect().toMap
    // day 1: {u1}; day 2: {u1, u2} — u1 counted ONCE though active twice
    // in the window; days 3+ clipped (no data past day 2)
    assert(got == Map(
      ts("2024-01-01 00:00:00") -> 1L,
      ts("2024-01-02 00:00:00") -> 2L))
  }

  test("denseDailyCounts: holes fill with 0 inside each type's own [first, last] range") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // view: days 1, 2, 5 — days 3 and 4 are holes
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-02 10:00:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-02 11:00:00"), 1L, "view", 0.0),
      (4L, ts("2024-01-05 10:00:00"), 1L, "view", 0.0),
      // click: a single day — no padding beyond its own range
      (5L, ts("2024-01-03 10:00:00"), 1L, "click", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.denseDailyCounts(events)
      .as[(String, Timestamp, Long)].collect().toSet
    assert(got == Set(
      ("view", ts("2024-01-01 00:00:00"), 1L),
      ("view", ts("2024-01-02 00:00:00"), 2L),
      ("view", ts("2024-01-03 00:00:00"), 0L),
      ("view", ts("2024-01-04 00:00:00"), 0L),
      ("view", ts("2024-01-05 00:00:00"), 1L),
      ("click", ts("2024-01-03 00:00:00"), 1L)))
  }

  test("daily CMS sketches: merged estimates bound exact per-key counts (never under, ≤ +ε·N)") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, dir, "events")
    val eps = 0.001
    val sketches = Analytics.dailyUserCms(events, eps = eps).cache()
    try {
      val (from, to) = ("1992-01-01", "2030-01-01")
      val total = events.count()
      val exact = events.groupBy("user_id").count()
        .as[(Long, Long)].collect().toMap
      val keys = exact.keys.toSeq.sorted.take(10) :+ 999999L // + absent key
      val est = Analytics.cmsEstimatesOverRange(sketches, from, to, keys)
        .as[(Long, Long)].collect().toMap
      keys.foreach { k =>
        val ex = exact.getOrElse(k, 0L)
        assert(est(k) >= ex, s"CMS must never undercount: key $k $ex vs ${est(k)}")
        assert(est(k) <= ex + math.ceil(eps * total).toLong,
          s"key $k estimate ${est(k)} above $ex + eps*N")
      }
      // sub-range estimates never exceed the full range's
      val days = sketches.select(date_format(col("day"), "yyyy-MM-dd"))
        .as[String].collect().sorted
      val sub = Analytics.cmsEstimatesOverRange(
        sketches, days.head, days(days.length / 2), keys)
        .as[(Long, Long)].collect().toMap
      keys.foreach(k => assert(sub(k) <= est(k)))
      // empty range answers 0, not a crash
      val none = Analytics.cmsEstimatesOverRange(sketches, "1980-01-01", "1980-01-02", keys)
        .as[(Long, Long)].collect().toMap
      assert(none.values.forall(_ == 0L))
    } finally { sketches.unpersist(); () }
  }

  test("dailyUserCms accepts eps whose toString is scientific notation") {
    // 1.0E-5 used to interpolate into the SQL string as the unparseable
    // literal `1.0E-5d`; the typed-Literal build must take it as-is.
    val events = graft.sources.Tables.load(spark, dir, "events").limit(100)
    val n = Analytics.dailyUserCms(events, eps = 1.0e-5).count()
    assert(n > 0)
  }

  test("daily HLL sketches merge to the range's distinct count (sketch of union ≡ union of sketches)") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.load(spark, dir, "events")
    val sketches = Analytics.dailyUserSketches(events).cache()
    try {
      val (from, to) = ("1992-01-01", "2030-01-01") // cover everything
      val est = Analytics.distinctOverRange(sketches, from, to)
        .as[Long].collect().head
      val exact = events.select(countDistinct(col("user_id")))
        .as[Long].collect().head
      // Datasketches HLL at default lgK=12 is ~1.6% rsd; 5% is generous
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"range estimate $est vs exact $exact")
      // a sub-range must never estimate above the full range
      val days = sketches.select(date_format(col("day"), "yyyy-MM-dd"))
        .as[String].collect().sorted
      val sub = Analytics.distinctOverRange(sketches, days.head, days(days.length / 2))
        .as[Long].collect().head
      assert(sub <= est)
      // an empty range answers 0, not NULL
      assert(Analytics.distinctOverRange(sketches, "2200-01-01", "2200-12-31")
        .as[Long].collect().head == 0L)
    } finally sketches.unpersist()
  }

  test("approx_percentile tracks the exact percentiles") {
    val exact = Analytics.valueQuantiles(spark, dir)
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = Analytics.approxValueQuantiles(spark, dir)
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty)
    approx.foreach { case (tpe, p50, p95) =>
      val (e50, e95) = exact(tpe)
      // approx_percentile returns a nearest-sample value (no interpolation);
      // in the sparse tail that can sit a few values away from the exact
      // interpolated quantile, so the bound is relative
      def close(a: Double, e: Double) = math.abs(a - e) <= math.max(2.0, 0.05 * math.abs(e))
      assert(close(p50, e50), s"$tpe p50 $p50 vs $e50")
      assert(close(p95, e95), s"$tpe p95 $p95 vs $e95")
    }
  }

  test("star revenue: exact scaled-integer sum matches a driver-side recompute") {
    val got = Analytics.starRevenue(spark, dir)
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // independent recompute through SQL joins on the same session
    graft.sources.Tables.registerAll(spark, dir)
    val want = spark.sql(
      """SELECT n_name, CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) / 10000.0 AS DOUBLE) AS rev,
        |  count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
      .as[(String, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("histQuantiles: estimates within one bin width of the exact quantile; clamped bins conserve counts") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(7)
    val rows = (1 to 600).map { i =>
      val day = 1 + (i % 5) // 2024-01-01..05
      val v = if (i % 100 == 0) 999.0 else rnd.nextDouble() * 200.0 // clamp outliers
      (i.toLong, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), i.toLong % 7,
        "click", v)
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val width = 20.0
    val hist = Analytics.dailyValueHistograms(events, width, bins = 10)
    // conservation under clamping: Σ bin counts ≡ row count
    assert(hist.agg(org.apache.spark.sql.functions.sum("n")).as[Long].head() == 600L)
    // every estimate within one bin width of the true range quantile
    val inRange = rows.filter(r => {
      val d = r._2.toLocalDateTime.getDayOfMonth; d >= 2 && d <= 4
    }).map(_._5).sorted
    val got = Analytics.histQuantiles(hist, "2024-01-02", "2024-01-04",
        Seq(0.5, 0.9), width)
      .select("p", "est").as[(Double, Double)].collect().toMap
    assert(got.size == 2)
    got.foreach { case (p, est) =>
      // exact p-quantile bracket: the value at rank ceil(p·N)
      val exact = inRange(math.ceil(p * inRange.size).toInt - 1)
      // clamped outliers (999 → top bin) shift the top-bin interpolation,
      // but 0.9 sits below the clamp mass; tolerance = one bin width
      assert(math.abs(est - math.min(exact, 200.0)) <= width,
        s"p=$p est=$est exact=$exact")
    }
  }

  test("winsorize: clips to the group quantiles, interior values pass raw") {
    val out = Analytics.winsorizedEvents(spark, dir)
      .as[(Long, String, Double, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, tpe, v, clipped, lo, hi) =>
      assert(clipped >= lo && clipped <= hi, s"$tpe: $clipped outside [$lo, $hi]")
      if (v >= lo && v <= hi) assert(clipped == v, s"$tpe: interior $v changed")
      if (v < lo) assert(clipped == lo)
      if (v > hi) assert(clipped == hi)
    }
    // the cut binds on both sides somewhere
    assert(out.exists(r => r._3 < r._5) && out.exists(r => r._3 > r._6))
  }

  test("robustDailyAnomalies: an extreme day cannot mask itself; MAD=0 series score NULL") {
    import java.sql.Timestamp
    def day(d: Int, k: Int) = (1 to k).map(i =>
      ((d * 100 + i).toLong, Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"),
        i.toLong, "spike", 0.0))
    // 6 normal days of ~10 events, one day of 100
    val spiky = (1 to 6).flatMap(d => day(d, 10 + d % 2)) ++ day(7, 100)
    // a perfectly constant series: MAD = 0, rz must be NULL
    val flat = (10 to 14).flatMap(d => (1 to 5).map(i =>
      ((d * 1000 + i).toLong, Timestamp.valueOf(f"2024-01-$d%02d 11:00:00"),
        i.toLong, "flat", 0.0)))
    val events = (spiky ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.robustDailyAnomalies(events)
      .as[(String, java.sql.Timestamp, Long, Double, Double, Option[Double])]
      .collect()
    val spike = out.filter(_._1 == "spike")
    val spikeDay = spike.maxBy(_._3)
    assert(spikeDay._3 == 100L && spikeDay._6.get > 3.0,
      s"the 100-event day must flag: $spikeDay")
    assert(spike.filter(_._3 <= 11).forall(r => math.abs(r._6.get) <= 3.0),
      s"normal days must not flag: ${spike.toSeq}")
    assert(out.filter(_._1 == "flat").forall(_._6.isEmpty),
      "a constant series has no scale - rz must be NULL")
  }

  test("stationaryEventMix: conserves mass and converges on a hand-built chain") {
    import java.sql.Timestamp
    // one user walks a -> b -> a -> b ... : stationary = (0.5, 0.5)
    val walk = (1 to 40).map(i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"), 1L,
        if (i % 2 == 1) "a" else "b", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.stationaryEventMix(walk, iters = 5)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.5), s"got $got")
    // real data: mass conserved within per-iteration rounding, all
    // states present, every p in [0, 1]
    val mix = Analytics.stationaryEvents(spark, dir)
      .as[(String, Double)].collect()
    assert(math.abs(mix.map(_._2).sum - 1.0) < 1e-4, s"mass ${mix.map(_._2).sum}")
    assert(mix.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    val types = graft.sources.Tables.load(spark, dir, "events")
      .select("event_type").distinct().count()
    assert(mix.length.toLong == types)
  }

  test("histQuantiles: empty day range answers zero rows") {
    import java.sql.Timestamp
    val events = Seq((1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "c", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val hist = Analytics.dailyValueHistograms(events)
    assert(Analytics.histQuantiles(hist, "2024-02-01", "2024-02-05",
      Seq(0.5)).count() == 0L)
  }

  test("landed day-partitioned histogram serve prunes partitions and matches the direct answer") {
    val direct = Analytics.histQuantilesEvents(spark, dir)
      .as[(Double, Double, Long)].collect().toSet
    val served = Analytics.histQuantilesSteady(spark, dir)
    val got = served.as[(Double, Double, Long)].collect().toSet
    assert(got == direct, s"served $got, direct $direct")
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(raw"PartitionFilters: \[[^\]]*day".r.findFirstIn(plan).isDefined,
      s"landed serve must prune on the day partition column:\n$plan")
  }
}
