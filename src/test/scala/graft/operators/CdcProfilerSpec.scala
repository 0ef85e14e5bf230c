package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Changelog application and table profiling on hand-built inputs. */
class CdcProfilerSpec extends SparkTestBase {
  import spark.implicits._

  test("applyChangelog: last change per key wins; deletes drop; untouched pass through") {
    val base = Seq(
      (10L, "a", 1.0), // will be updated (twice — seq 2 wins)
      (11L, "b", 2.0), // will be deleted
      (12L, "c", 3.0), // untouched
      (13L, "d", 4.0), // deleted then re-inserted (seq 2 wins)
    ).toDF("k", "s", "v")
    val changes = Seq(
      (10L, 1L, "a1", 1.1, "U"),
      (10L, 2L, "a2", 1.2, "U"),
      (11L, 1L, "b", 2.0, "D"),
      (13L, 1L, "d", 4.0, "D"),
      (13L, 2L, "d2", 4.2, "U"),
      (14L, 1L, "new", 5.0, "U"), // insert of an unseen key
      (15L, 1L, "gone", 6.0, "D"), // delete of an unseen key: no row
    ).toDF("k", "seq", "s", "v", "op")
    val out = Cdc.applyChangelog(base, changes, Seq("k"), Seq("seq"), "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (10L, "a2", 1.2), (12L, "c", 3.0), (13L, "d2", 4.2), (14L, "new", 5.0)))
  }

  test("scd2History: versions chain [from, to); deletes close but emit nothing; latest is current") {
    val changes = Seq(
      // key 1: v1 → v2 → delete → v3 (re-insert): three rows, only the
      // last current; the delete closes v2's interval silently
      (1L, 10L, "v1", "U"),
      (1L, 20L, "v2", "U"),
      (1L, 30L, "gone", "D"),
      (1L, 40L, "v3", "U"),
      // key 2: single insert — open-ended current version
      (2L, 15L, "only", "U"),
      // key 3: insert then delete — one CLOSED version, nothing current
      (3L, 10L, "was", "U"),
      (3L, 25L, "bye", "D"),
    ).toDF("k", "t", "s", "op")
    val out = Cdc.scd2History(changes, Seq("k"), Seq("t"), "t", "op")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().toSeq.sortBy(r => (r._1, r._3))
    assert(out == Seq(
      (1L, "v1", 10L, Some(20L), false),
      (1L, "v2", 20L, Some(30L), false), // closed BY the delete
      (1L, "v3", 40L, None, true),
      (2L, "only", 15L, None, true),
      (3L, "was", 10L, Some(25L), false), // closed, and key 3 has no current
    ))
    // interval law: within a key, valid_to == next valid_from or NULL last
    out.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.isEmpty || a._4.get <= b._3)
        case _ =>
      }
      assert(vs.count(_._5) <= 1, "at most one current version per key")
    }
  }

  test("applyChangelog: a NULL op upserts instead of silently deleting the key") {
    val base = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "s", "v")
    val changes = Seq((1L, 1L, "x2", 1.5, null: String), (3L, 1L, "z", 3.0, null: String))
      .toDF("k", "seq", "s", "v", "op")
    val out = Cdc.applyChangelog(base, changes, Seq("k"), Seq("seq"), "op")
      .as[(Long, String, Double)].collect().toSet
    // malformed (NULL) ops must degrade to upserts — NOT fall through the
    // null-false `=!= "D"` filter and vanish from both base and upserts
    assert(out == Set((1L, "x2", 1.5), (2L, "y", 2.0), (3L, "z", 3.0)))
  }

  test("applyChangelog is idempotent: re-applying the same changelog is a no-op") {
    val base = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "s", "v")
    val changes = Seq((1L, 5L, "x2", 1.5, "U"), (2L, 5L, "y", 2.0, "D"))
      .toDF("k", "seq", "s", "v", "op")
    val once = Cdc.applyChangelog(base, changes, Seq("k"), Seq("seq"), "op")
    val twice = Cdc.applyChangelog(once, changes, Seq("k"), Seq("seq"), "op")
    assert(twice.as[(Long, String, Double)].collect().toSet ==
      once.as[(Long, String, Double)].collect().toSet)
  }

  test("snapshotDiff: added/deleted/updated classified, unchanged keys drop out") {
    val before = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val after  = Seq((2L, "b", 2.0), (3L, "c2", 3.0), (4L, "d", 4.0)).toDF("k", "s", "v")
    val got = Cdc.snapshotDiff(before, after, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "deleted"), (3L, "updated"), (4L, "added")))
  }

  test("checkExpectations: violation counts, NULL predicates violate, FK anti-join") {
    val df = Seq(
      (1L, Some(5.0), "click"),
      (2L, None, "view"),          // value NULL -> range check violation
      (2L, Some(999.0), "bogus"),  // dup key + unknown type
      (4L, Some(-7.0), "click"),
    ).toDF("id", "v", "t")
    val dim = Seq(1L, 2L).toDF("pk")
    val got = Profiler.checkExpectations(df,
        Seq(
          "v_in_range" -> org.apache.spark.sql.functions.col("v").between(-10, 10),
          "known_t" -> org.apache.spark.sql.functions.col("t").isin("click", "view")),
        uniqueKey = Some("id"))
      .unionByName(Profiler.checkReferential(df, "id", dim, "pk", "id_fk"))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("v_in_range") == (2L, false)) // NULL + 999.0
    assert(got("known_t") == (1L, false))
    assert(got("id_unique") == (1L, false))  // one duplicate of key 2
    assert(got("id_fk") == (1L, false))      // id 4 has no dim partner
    // check names are values, not SQL text: quotes/spaces must be fine
    // (the NULL-v row still violates — NULL predicates violate by contract)
    val quoted = Profiler.checkExpectations(df,
        Seq("value's range (loose)" -> org.apache.spark.sql.functions.col("v").between(-1000, 1000)))
      .as[(String, Long, Boolean)].collect().head
    assert(quoted == (("value's range (loose)", 1L, false)))
  }

  test("observeExpectations: counters ride the write job itself, matching the batch gate") {
    val df = Seq(
      (1L, Some(5.0), "click"),
      (2L, None, "view"),
      (3L, Some(999.0), "bogus"),
      (4L, Some(-7.0), "click"),
    ).toDF("id", "v", "t")
    val checks = Seq(
      "v_in_range" -> org.apache.spark.sql.functions.col("v").between(-10, 10),
      "known_t" -> org.apache.spark.sql.functions.col("t").isin("click", "view"))
    val (gated, obs) = Profiler.observeExpectations(df, checks)
    // the action the pipeline was going to run anyway — the land itself
    val out = java.nio.file.Files.createTempDirectory("obs").toString
    gated.write.mode("overwrite").parquet(out)
    val metrics = obs.get
    assert(metrics("v_v_in_range") == 2L) // NULL + 999.0
    assert(metrics("v_known_t") == 1L)
    // the write landed every row — observation never filters
    assert(spark.read.parquet(out).count() == 4)
  }

  test("profile: exact counts, nulls, distincts, numeric min/max; NULL for strings") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (2L, null), (null, "a"), (3L, "c"),
    ).toDF("id", "s")
    val out = Profiler.profile(df, Seq("id", "s"), exact = true)
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id") == ("id", 5L, 1L, 3L, Some(1.0), Some(3.0)))
    assert(out("s") == ("s", 5L, 1L, 3L, None, None))
  }

  test("profile: approx distinct within HLL++ tolerance of exact") {
    val df = (1 to 5000).map(i => (i.toLong, (i % 700).toString)).toDF("id", "s")
    val ap = Profiler.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r._4).toMap
    // default rsd = 5%; allow 3σ-ish slack — this pins "same order of
    // magnitude, sketch wired correctly", not the estimator's variance
    assert(math.abs(ap("id") - 5000L) <= 750, s"id approx ${ap("id")}")
    assert(math.abs(ap("s") - 700L) <= 105, s"s approx ${ap("s")}")
  }
}
