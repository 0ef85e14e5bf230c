package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY §2 (or a §7.3
  * extension); entries in [[oracleSql]] are the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.sortLimit(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Reference query surface (SURVEY §2.3) ────────────────────────
    "q1_sort_limit"  -> RefQueries.sortLimit _,
    "q2_count"       -> RefQueries.countAll _,
    "q3_null_blank"  -> RefQueries.nullBlankFilter _,
    "q4_dup_having"  -> RefQueries.dupHaving _,
    "q5_range"       -> RefQueries.rangeFilter _,
  )

  def oracleSql: Map[String, String] = Map(
    "q1_sort_limit" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_name ASC, c_custkey ASC LIMIT 20""",
    "q2_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q3_null_blank" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE text IS NULL OR text = '' ORDER BY doc_id""",
    "q4_dup_having" ->
      """SELECT text, count(*) AS n_copies FROM documents
         GROUP BY text HAVING count(*) > 1
         ORDER BY n_copies DESC, text ASC""",
    "q5_range" ->
      """SELECT event_id, user_id, value FROM events
         WHERE value NOT BETWEEN 0 AND 100
            OR user_id NOT BETWEEN 0 AND 1000000
         ORDER BY event_id""",
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
