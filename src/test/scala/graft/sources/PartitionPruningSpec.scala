package graft.sources

import graft.SparkTestBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over a date/type-partitioned landed table —
  * the scan-side win the reference's docs suggest but never implement
  * ("partition the table by ingestion date",
  * docs/athena-integrity-check.md:64). A fact table landed with
  * `partitionBy` gets two prunings for free from Catalyst:
  * static (literal predicates select directories before the scan) and
  * dynamic (a join's dim-side filter becomes a runtime subquery that
  * prunes fact partitions DURING planning of the join). At 100 TB,
  * partition pruning is the difference between scanning a day and
  * scanning a decade. */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("static pruning: a literal partition predicate reads only its directories") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("part-events").toFile.getAbsolutePath
    Tables.load(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val part = spark.read.parquet(out).filter($"event_type" === "error")
    val plan = part.queryExecution.executedPlan.toString
    // the partition filter must NOT survive as a data filter — it is
    // consumed by the file index (PartitionFilters), and the scan's
    // location lists only the matching directory
    assert(!plan.contains("Filter (isnotnull(event_type"),
      "partition predicate leaked into a row-level Filter")
    val want = Tables.load(spark, dir, "events").filter($"event_type" === "error").count()
    assert(part.count() == want)
  }

  test("dynamic pruning: a dim-side filter prunes fact partitions via a runtime subquery") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("dpp-events").toFile.getAbsolutePath
    Tables.load(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val fact = spark.read.parquet(out)
    // dim: (etype, category) — the filter selects 2 of 5 types.
    // Landed as parquet: a local in-memory relation folds its filter into
    // the LocalRelation, leaving DPP no selective predicate to detect.
    // (and the predicate must be literal-comparison-shaped: Catalyst's
    // isLikelySelective heuristic does not treat a bare boolean column as
    // a pruning filter)
    val dimPath = Files.createTempDirectory("dpp-dim").toFile.getAbsolutePath
    Seq(("purchase", "conv"), ("signup", "conv"), ("click", "traffic"),
      ("view", "traffic"), ("error", "ops")).toDF("etype", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim, fact("event_type") === dim("etype"))
      .filter($"category" === "conv")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a dynamic partition pruning subquery in:\n${plan.take(2000)}")
    val got = joined.as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "events")
      .filter($"event_type".isin("purchase", "signup"))
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }
}
