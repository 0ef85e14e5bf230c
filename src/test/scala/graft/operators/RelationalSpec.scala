package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Set-op / rollup / pivot / deterministic-sample semantics, each checked
  * against an independent reformulation over the same testdata.
  */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def dayset(t: String): Set[(Long, java.sql.Timestamp)] =
    Tables.load(spark, dir, "events")
      .filter(col("event_type") === t)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
      .as[(Long, java.sql.Timestamp)].collect().toSet

  test("setOps: the three tags partition the click/purchase day sets") {
    val rows = Relational.setOps(spark, dir)
      .as[(String, Long, java.sql.Timestamp)].collect()
    val byOp = rows.groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val click = dayset("click")
    val purchase = dayset("purchase")
    assert(byOp.getOrElse("both", Set.empty) == (click intersect purchase))
    assert(byOp.getOrElse("click_only", Set.empty) == (click diff purchase))
    assert(byOp.getOrElse("purchase_only", Set.empty) == (purchase diff click))
    // day granularity keeps all three legs non-vacuous on this data
    assert(byOp.keySet == Set("both", "click_only", "purchase_only"))
    assert(rows.length == rows.map(r => (r._2, r._3)).distinct.length,
      "tags must partition: no user-day may appear under two ops")
  }

  test("setOpsAll: multiplicities equal min / positive-difference of the leg counts") {
    val legs = graft.sources.Tables.load(spark, dir, "events")
      .filter($"event_type".isin("click", "view"))
      .groupBy($"user_id", org.apache.spark.sql.functions.date_trunc("day", $"ts").as("day"))
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.when($"event_type" === "click", 1)).as("ca"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.when($"event_type" === "view", 1)).as("cb"))
      .as[(Long, java.sql.Timestamp, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val got = Relational.setOpsAll(spark, dir)
      .as[(String, Long, java.sql.Timestamp, Long)].collect()
    assert(got.nonEmpty && got.exists(_._1 == "intersect_all") && got.exists(_._1 == "except_all"))
    got.foreach { case (op, u, d, n) =>
      val (ca, cb) = legs((u, d))
      op match {
        case "intersect_all" => assert(n == math.min(ca, cb) && n > 0)
        case "except_all"    => assert(n == ca - cb && n > 0)
      }
    }
  }

  test("unionEvolved: legacy rows NULL-fill props, evolved rows keep it, counts reconcile") {
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val out = Relational.unionEvolved(spark, dir)
    assert(out.count() == ev.count())
    assert(out.columns.toSeq == Seq("event_id", "user_id", "value", "props"))
    val legacyNulls = out.filter($"event_id" % 2 === 0 && $"props".isNull).count()
    assert(legacyNulls == ev.filter($"event_id" % 2 === 0).count())
    val evolvedWith = out.filter($"event_id" % 2 === 1 && $"props".isNotNull).count()
    assert(evolvedWith == ev.filter($"event_id" % 2 === 1 && $"props".isNotNull).count())
  }

  test("rollup: subtotal and grand-total rows reconcile with the leaves") {
    val rows = Relational.dailyRollup(spark, dir)
      .as[(java.sql.Timestamp, String, Long, Double, Long, Long)].collect()
    val leaves = rows.filter(r => r._5 == 0 && r._6 == 0)
    val daySub = rows.filter(r => r._5 == 0 && r._6 == 1)
    val grand = rows.filter(r => r._5 == 1 && r._6 == 1)
    assert(grand.length == 1)
    assert(grand.head._3 == leaves.map(_._3).sum)
    assert(grand.head._3 == Tables.load(spark, dir, "events").count())
    daySub.foreach { s =>
      assert(s._3 == leaves.filter(_._1 == s._1).map(_._3).sum,
        s"day subtotal ${s._1} must equal its leaf sum")
    }
    assert(daySub.length == leaves.map(_._1).distinct.length)
  }

  test("cube: rollup rows plus the per-type subtotals rollup omits") {
    val cube = Relational.dailyCube(spark, dir)
      .as[(java.sql.Timestamp, String, Long, Double, Long, Long)].collect()
    val rollup = Relational.dailyRollup(spark, dir)
      .as[(java.sql.Timestamp, String, Long, Double, Long, Long)].collect()
    assert(rollup.toSet.subsetOf(cube.toSet), "cube ⊇ rollup lattice")
    val typeTotals = cube.filter(r => r._5 == 1 && r._6 == 0)
    assert(typeTotals.nonEmpty, "per-type subtotals are cube-only")
    val total = Tables.load(spark, dir, "events").count()
    assert(typeTotals.map(_._3).sum == total)
    assert(cube.length == rollup.length + typeTotals.length)
  }

  test("pivot: per-type columns sum back to the per-user event count") {
    val totals = Tables.load(spark, dir, "events")
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val rows = Relational.pivotCounts(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == totals.size)
    rows.foreach { case (u, c, e, p, s, v) =>
      assert(c + e + p + s + v == totals(u), s"user $u row sum mismatch")
    }
  }

  test("dailyFullOuter: both unmatched directions occur and totals reconcile") {
    val rows = Relational.dailyFullOuter(spark, dir)
      .as[(java.sql.Timestamp, Long, Long)].collect()
    val ev = Tables.load(spark, dir, "events")
    def total(t: String): Long =
      ev.filter(col("event_type") === t && col("value") > 95).count()
    assert(rows.map(_._2).sum == total("click"))
    assert(rows.map(_._3).sum == total("purchase"))
    assert(rows.exists(r => r._2 == 0 && r._3 > 0), "purchase-only day must exist")
    assert(rows.exists(r => r._3 == 0 && r._2 > 0), "click-only day must exist")
    assert(rows.map(_._1).distinct.length == rows.length, "one row per day")
  }

  test("existsSubquery: decorrelates to semi/anti joins and matches a join reformulation") {
    val df = Relational.existsSubquery(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"EXISTS/NOT EXISTS must decorrelate to semi/anti joins:\n$plan")
    val got = df.as[(Long, String)].collect().toSet

    val ev = Tables.load(spark, dir, "events")
    val cust = Tables.load(spark, dir, "customer")
    val want = cust
      .join(ev.filter(col("event_type") === "error")
        .select(col("user_id").as("c_custkey")).distinct(), Seq("c_custkey"), "left_semi")
      .join(ev.filter(col("event_type") === "purchase" && col("value") > 95)
        .select(col("user_id").as("c_custkey")).distinct(), Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name").as[(Long, String)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stratifiedSample: deterministic, stratum-complete, rate-plausible") {
    val a = Relational.stratifiedSample(spark, dir)
      .as[(Long, Long, String, Double)].collect().toSet
    val b = Relational.stratifiedSample(spark, dir)
      .as[(Long, Long, String, Double)].collect().toSet
    assert(a == b, "hash-mod sampling must be run-to-run deterministic")

    val ev = Tables.load(spark, dir, "events")
    val nErrors = ev.filter(col("event_type") === "error").count()
    assert(a.count(_._3 == "error") == nErrors, "rate 100 keeps every error")

    val nClicks = ev.filter(col("event_type") === "click").count()
    val kept = a.count(_._3 == "click").toDouble / nClicks
    // 10% target; binomial noise at this SF is wide but bounded
    assert(kept > 0.02 && kept < 0.25, s"click keep-rate $kept implausible for 10%")

    val ids = ev.select("event_id").as[Long].collect().toSet
    assert(a.forall(r => ids.contains(r._1)), "sample must be a subset")
  }

  test("weightedSample: deterministic, weight-respecting, in-stratum top-k") {
    // one giant-weight doc per stratum must always win a slot; the whole
    // selection must be reproducible run to run
    val docs = ((1 to 60).map(i => (i.toLong, if (i <= 30) "en" else "de", 100L)) ++
      Seq((900L, "en", 1000000L), (901L, "de", 1000000L)))
      .toDF("doc_id", "lang", "n_chars")
    val a = Relational.weightedSample(docs, "lang", "doc_id", "n_chars", k = 5)
      .as[(String, Long, Double)].collect().toSet
    val b = Relational.weightedSample(docs, "lang", "doc_id", "n_chars", k = 5)
      .as[(String, Long, Double)].collect().toSet
    assert(a == b, "A-ES keys are pure functions of the row — must be deterministic")
    assert(a.count(_._1 == "en") == 5 && a.count(_._1 == "de") == 5)
    // u^(1/w) with w 10^4 larger concentrates near 1: the planted docs win
    assert(a.exists(r => r._2 == 900L) && a.exists(r => r._2 == 901L),
      s"giant-weight docs must be sampled: $a")
  }

  test("hashSplit: complete partition, stable under appends, plausible ratios") {
    val docs = (1 to 2000).map(i => (i.toLong, s"d$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val full = Relational.hashSplit(docs, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(full.size == 2000 && full.values.toSet == Set("train", "val", "test"))
    val frac = full.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05 && math.abs(frac("val") - 0.1) < 0.03
      && math.abs(frac("test") - 0.1) < 0.03, s"implausible ratios: $frac")
    // append-stability: the assignment of a row is independent of the rest
    // of the table — splitting any subset agrees with the full table
    val sub = Relational.hashSplit(docs.filter(col("doc_id") <= 500), "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => full(id) == s },
      "a row's split must never change as the corpus grows")
  }

  test("leakFreeSplits: near-dup pairs never straddle splits; coverage complete") {
    val dir = "/root/testdata/sf0.001"
    val out = Relational.leakFreeSplits(spark, dir)
      .as[(Long, Long, String)].collect()
    val docs = graft.operators.Dedup.plantedNearDocs(spark, dir)
    assert(out.length == docs.count(), "every doc must be assigned")
    val splitOf = out.map(r => r._1 -> r._3).toMap
    val pairs = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles splits")
    }
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("deterministicShuffle: exact permutation, seed-sensitive, partition-invariant") {
    val docs = (0L until 300L).toDF("doc_id")
    val out = Relational.deterministicShuffle(docs, "doc_id")
      .as[(Long, Long)].collect()
    // exact 0..N-1 positions, each doc exactly once
    assert(out.map(_._1).sorted.toSeq == (0L until 300L))
    assert(out.map(_._2).distinct.length == 300)
    // a different epoch seed produces a different order
    val epoch1 = Relational.deterministicShuffle(docs, "doc_id", seed = "epoch1")
      .as[(Long, Long)].collect()
    assert(out.toMap != epoch1.toMap)
    assert(epoch1.map(_._1).sorted.toSeq == (0L until 300L))
    // pure function of (seed, id): physical partitioning cannot move anyone
    val again = Relational.deterministicShuffle(docs.repartition(7), "doc_id")
      .as[(Long, Long)].collect()
    assert(out.toMap == again.toMap)
  }

  test("denseRankByKey: rank-device equivalence law — ≡ global row_number, any buckets") {
    // sparse, unordered, negative-spanning distinct keys: the distributed
    // range-bucketed rank must equal row_number() OVER (ORDER BY key) − 1
    // exactly, for ANY bucket count (bucketing is order-preserving, so
    // offset + per-bucket rank is the global rank by construction)
    val keys = Seq(-900000L, -7L, 0L, 3L, 37L, 41L, 1L << 40, Long.MaxValue - 5) ++
      (0L until 200L).map(i => i * i * 13 + 11)
    val df = keys.distinct.reverse.toDF("k").repartition(7)
    val want = keys.distinct.sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toMap
    for (b <- Seq(1, 8, 1024)) {
      val got = Relational.denseRankByKey(df, "k", "r", buckets = b)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"buckets=$b must reproduce the global dense rank")
    }
    // empty input: total function, no rows
    assert(Relational.denseRankByKey(Seq.empty[Long].toDF("k"), "k", "r")
      .count() == 0)
    // null keys fail FAST (round-16 advice): a null quotient would
    // otherwise silently rank into the top bucket with a wrong global
    // rank — the contract is non-null, enforced, not assumed
    val withNull = Seq(Some(1L), None, Some(5L)).toDF("k")
    val ex = intercept[IllegalArgumentException] {
      Relational.denseRankByKey(withNull, "k", "r").collect()
    }
    assert(ex.getMessage.contains("null"))
  }

  test("stratifiedSample: rate monotonicity law — raising a rate only adds rows") {
    // the keep decision is bucket(event_id) < rate, with the bucket a pure
    // function of the row — so for every stratum, sample(r1) ⊆ sample(r2)
    // whenever r1 <= r2 pointwise. This is what makes hash-mod sampling
    // resumable: growing a sample never invalidates already-kept rows.
    val low = Relational.stratifiedSample(spark, dir,
      Map("error" -> 20, "purchase" -> 10, "click" -> 5, "view" -> 5, "signup" -> 5))
      .select("event_id").as[Long].collect().toSet
    val high = Relational.stratifiedSample(spark, dir,
      Map("error" -> 60, "purchase" -> 40, "click" -> 25, "view" -> 25, "signup" -> 25))
      .select("event_id").as[Long].collect().toSet
    assert(low.subsetOf(high), "pointwise-higher rates must be a superset")
    assert(low.size < high.size)
  }
}
