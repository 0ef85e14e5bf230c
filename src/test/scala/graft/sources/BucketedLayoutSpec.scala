package graft.sources

import graft.SparkTestBase
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed-layout contract: a table landed `bucketBy(key)` serves
  * key-aligned aggregates, joins, and keep-first dedup with NO Exchange in
  * the executed plan — the write-once/shuffle-never property the layout
  * exists for — and with results identical to the unbucketed path.
  */
class BucketedLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1704100000000L + m * 60000L)

  private lazy val events: DataFrame = {
    val rng = new scala.util.Random(11)
    (1 to 400).map { i =>
      (i.toLong, ts(rng.nextInt(600)), (i % 37).toLong, s"t${i % 3}", rng.nextDouble())
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString

  private lazy val bucketed: DataFrame = {
    Layout.writeBucketed(events, "events_bucketed",
      Seq("user_id"), Seq("user_id", "ts"), buckets = 4, path = s"$tmp/events_bucketed")
    spark.table("events_bucketed")
  }

  /** Materialize and return the AQE-final plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("groupBy on the bucket key aggregates with no Exchange") {
    val agg = bucketed.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("s"))
    val plan = finalPlan(agg)
    assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
    val want = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(agg.as[(Long, Long, Double)].collect().toSet == want)
  }

  test("co-bucketed join on the bucket key merges with no Exchange") {
    val users = events.select("user_id").distinct()
      .withColumn("segment", concat(lit("seg"), pmod(col("user_id"), lit(3))))
    Layout.writeBucketed(users, "users_bucketed",
      Seq("user_id"), Seq("user_id"), buckets = 4, path = s"$tmp/users_bucketed")
    // hint(merge) keeps AQE from choosing broadcast at toy scale — the
    // at-scale plan IS the sort-merge join, which co-bucketing feeds
    // shuffle-free on both sides
    val joined = bucketed.hint("merge")
      .join(spark.table("users_bucketed").hint("merge"), "user_id")
      .select("user_id", "event_id", "segment")
    val plan = finalPlan(joined)
    assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
    assert(joined.count() == 400, "join on a distinct dim key preserves the fact rows")
  }

  test("keep-first dedup on the bucket key runs with no Exchange") {
    val first = graft.operators.Dedup.exactKeepFirst(bucketed)
    val plan = finalPlan(first)
    assert(!plan.contains("Exchange"), s"bucketed keep-first must not shuffle:\n$plan")
    val want = graft.operators.Dedup.exactKeepFirst(events)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(first.select("user_id", "event_id").as[(Long, Long)].collect().toSet == want)
  }

  test("bucketed write is re-runnable and the table is external at the given path") {
    Layout.writeBucketed(events, "events_bucketed_rerun",
      Seq("user_id"), Seq("user_id", "ts"), buckets = 4, path = s"$tmp/rerun")
    Layout.writeBucketed(events, "events_bucketed_rerun",
      Seq("user_id"), Seq("user_id", "ts"), buckets = 4, path = s"$tmp/rerun")
    assert(spark.table("events_bucketed_rerun").count() == 400)
    assert(new java.io.File(s"$tmp/rerun").exists())
  }
}
