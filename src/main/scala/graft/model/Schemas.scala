package graft.model

import org.apache.spark.sql.types._

/** Declared record contracts (SURVEY §1.2).
  *
  * The reference declares its one schema three times (producer dict,
  * Spark StructType at spark/app/spark_processing.py:133-143, Athena DDL at
  * docs/athena-integrity-check.md:26-36); here it is declared once.
  */
object Schemas {

  /** The 9-column flattened name record — the system's data contract.
    * `zip` is deliberately STRING: it carries the decimal digits of a
    * 128-bit MD5 pseudonym (too wide for any SQL integer type). */
  val nameRecord: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("gender", StringType),
    StructField("address", StringType),
    StructField("city", StringType),
    StructField("nation", StringType),
    StructField("zip", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("email", StringType),
  ))

  /** Subset of the testdata `events` table used by the streaming-ingest
    * correctness entry (timestamps excluded: JSON round-trip formatting is
    * orthogonal to the parse→sink semantics under test). */
  val eventRecord: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
  ))
}
