package graft.operators

import graft.ingest.{Normalize, Parse}
import graft.model.Schemas
import graft.sources.{FileLinesSource, Tables}
import graft.streaming.StreamSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate entries for the ingest half of the reference (its main
  * program): the streaming parse→sink path and the producer's
  * normalization transform, both expressed so a DuckDB oracle over the
  * same testdata can hash-verify the result.
  */
object IngestQueries {

  /** S4+P1-P3+S5 end-to-end: events rows → JSON-lines wire format (P10) →
    * streaming read (file stand-in for Kafka, same `value` seam) → parse
    * (P1 cast, P2 from_json, P3 flatten) → checkpointed append Parquet
    * sink → read the landed table back. Trigger.AvailableNow drains the
    * backlog then stops, so the entry behaves like a query.
    * Oracle: the same 4 columns straight from `events`. */
  def streamIngestRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    val inputDir = s"$tmp/input"
    val outDir = s"$tmp/out"
    val ckptDir = s"$tmp/ckpt"

    val events = Tables.load(spark, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    Parse.toJsonValue(events).write.mode("overwrite").text(inputDir)

    val raw = FileLinesSource(inputDir).stream(spark)
    val parsed = Parse.parse(raw, Schemas.eventRecord)
    StreamSink.drainAvailable(parsed, outDir, ckptDir)

    spark.read.parquet(outDir)
  }

  /** P4-P10: the full producer transform over nested payloads synthesized
    * deterministically from `customer` (title/first/last, street
    * number/name, postcode, dirty coordinate strings — ~1/7 bad latitudes
    * and 1/5 empty longitudes exercise safe-float→NULL). The oracle
    * reconstructs the 128-bit MD5 pseudonym in DuckDB from two UBIGINT
    * halves, so `zip` is verified value-exact against Python's
    * int(md5hex,16) semantics. */
  def normalizeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val raw = c.select(
      struct(
        lit("Ms").as("title"),
        col("c_name").as("first"),
        col("c_mktsegment").as("last"),
      ).as("name"),
      when(col("c_custkey") % 2 === 0, "female").otherwise("male").as("gender"),
      struct(
        struct(
          col("c_custkey").as("number"),
          col("c_name").as("name"),
        ).as("street"),
        col("c_mktsegment").as("city"),
        concat(lit("Nation-"), col("c_nationkey").cast("string")).as("country"),
        col("c_custkey").cast("string").as("postcode"),
        struct(
          when(col("c_custkey") % 7 === 0, "bad").otherwise(col("c_custkey").cast("string"))
            .as("latitude"),
          when(col("c_custkey") % 5 === 0, "").otherwise(col("c_nationkey").cast("string"))
            .as("longitude"),
        ).as("coordinates"),
      ).as("location"),
      concat(col("c_name"), lit("@example.com")).as("email"),
    )
    Normalize(raw)
  }
}
