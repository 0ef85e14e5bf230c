package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's query-layer seam: an external table over files
  * registered in a catalog (reference: Athena DDL at
  * docs/athena-integrity-check.md:26-39). Here the catalog is Spark's own
  * session catalog and the storage format is columnar Parquet, which gives
  * predicate pushdown + column pruning for free — at 100 TB the scan cost
  * is dominated by how few bytes we can get away with reading, so every
  * query below should show PushedFilters / narrow ReadSchema in explain().
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads with
    // spark.sql.legacy.parquet.nanosAsLong=true (set in our sessions) as a
    // raw long. Convert to a proper timestamp here; integer DIV, not /1000.0
    // — epoch-nanos (~1.7e18) exceed double's 2^53 exact-integer range.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every table as a temp view so both the DataFrame and the
    * spark.sql entry points (reference entry point C, SURVEY §3.3) work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
