package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY §2 (or a §7.3
  * extension); entries in [[oracleSql]] are the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing). Queries with no SQL-expressible oracle (LSH/SimHash paths)
  * are intentionally absent from [[oracleSql]] → the driver records a
  * rows-only check and their semantics are covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.sortLimit(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── Reference query surface (SURVEY §2.3) ────────────────────────
    "q1_sort_limit"   -> (RefQueries.sortLimit _),
    "q2_count"        -> (RefQueries.countAll _),
    "q3_null_blank"   -> (RefQueries.nullBlankFilter _),
    "q3b_anti_join"   -> (RefQueries.antiJoinNull _),
    "q4_dup_having"   -> (RefQueries.dupHaving _),
    "q5_range"        -> (RefQueries.rangeFilter _),
    // ── Ingest half (SURVEY §2.1/§2.2 — the reference's main program) ─
    "s5_stream_ingest" -> (IngestQueries.streamIngestRoundtrip _),
    "p7_normalize"     -> (IngestQueries.normalizeCustomers _),
  )

  /** Subset timed by [[Bench]] at sf0.1 (streaming/DDL entries excluded —
    * they exercise sinks and the catalog, not scan/shuffle throughput). */
  def benchQueries: Seq[String] = Seq(
    "q1_sort_limit", "q2_count", "q3b_anti_join", "q4_dup_having", "q5_range",
  )

  def oracleSql: Map[String, String] = Map(
    "q1_sort_limit" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_name ASC, c_custkey ASC LIMIT 20""".stripMargin,
    "q2_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q3_null_blank" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE text IS NULL OR text = ''""".stripMargin,
    "q3b_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |LEFT JOIN (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup') e
        |  ON c.c_custkey = e.user_id
        |WHERE e.user_id IS NULL""".stripMargin,
    "q4_dup_having" ->
      """SELECT user_id, count(*) AS n_events FROM events
        |GROUP BY user_id HAVING count(*) > 1""".stripMargin,
    "q5_range" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE value NOT BETWEEN 0 AND 100
        |   OR user_id NOT BETWEEN 0 AND 1000000""".stripMargin,
    "s5_stream_ingest" ->
      "SELECT event_id, user_id, event_type, value FROM events",
    // zip = decimal string of the 128-bit int(md5hex, 16), rebuilt from two
    // unsigned-64 halves (DuckDB's md5_number uses a different byte order).
    "p7_normalize" ->
      """SELECT
        |  'Ms. ' || c_name || ' ' || c_mktsegment AS name,
        |  CASE WHEN c_custkey % 2 = 0 THEN 'female' ELSE 'male' END AS gender,
        |  CAST(c_custkey AS VARCHAR) || ', ' || c_name AS address,
        |  c_mktsegment AS city,
        |  'Nation-' || CAST(c_nationkey AS VARCHAR) AS nation,
        |  (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 16)) AS UBIGINT)::UHUGEINT
        |     * 18446744073709551616::UHUGEINT
        |   + CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 17, 16)) AS UBIGINT)::UHUGEINT
        |  )::VARCHAR AS zip,
        |  TRY_CAST(CASE WHEN c_custkey % 7 = 0 THEN 'bad'
        |                ELSE CAST(c_custkey AS VARCHAR) END AS DOUBLE) AS latitude,
        |  TRY_CAST(CASE WHEN c_custkey % 5 = 0 THEN ''
        |                ELSE CAST(c_nationkey AS VARCHAR) END AS DOUBLE) AS longitude,
        |  c_name || '@example.com' AS email
        |FROM customer""".stripMargin,
  )
}
