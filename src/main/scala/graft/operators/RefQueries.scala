package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's declared query surface (SURVEY §2.3 — the Athena
  * validation queries, docs/athena-integrity-check.md:47-61), re-expressed
  * over the driver's testdata tables with identical operator semantics:
  * scan, project, total sort + limit (top-k), ungrouped count, null/blank
  * filters, group-by + HAVING duplicate detection, range predicates.
  *
  * Scale notes (100 TB): every query here is a single scan with either a
  * top-k (TakeOrderedAndProject — no global sort materialization) or a
  * two-phase hash aggregate (partial map-side combine before the shuffle).
  * Filters are plain column predicates so they push down to the Parquet
  * row-group level.
  */
object RefQueries {

  /** Q1 analogue (athena-integrity-check.md:51): ORDER BY + LIMIT → top-k.
    * Catalyst plans this as TakeOrderedAndProject: each task keeps a 20-row
    * heap, only 20 rows/partition reach the driver — no global sort, which
    * is the difference between O(k) and O(n log n) memory at 100 TB. */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(asc("c_name"), asc("c_custkey"))
      .limit(20)

  /** Q2 analogue (athena-integrity-check.md:57): ungrouped COUNT(*).
    * Partial counts per partition, single long merged at the driver. */
  def countAll(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Q3 analogue (athena-integrity-check.md:59): IS NULL OR = '' filter —
    * the reference's data-quality scan for blank names. */
  def nullBlankFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .filter(col("text").isNull || col("text") === "")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Q4 analogue (athena-integrity-check.md:60): GROUP BY + HAVING count>1
    * — duplicate detection, the seed of the §7.3 dedup operators. */
  def dupHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("text")
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("text"), col("n_copies"))
      .orderBy(desc("n_copies"), asc("text"))

  /** Q5 analogue (athena-integrity-check.md:61): NOT BETWEEN range check,
    * OR of two predicates, NULL rows excluded (SQL three-valued logic). */
  def rangeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(!col("value").between(0, 100) || !col("user_id").between(0, 1000000))
      .select("event_id", "user_id", "value")
      .orderBy("event_id")
}
