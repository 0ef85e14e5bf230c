package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog DDL path (SURVEY §2 S8/Q6): the reference's Athena/Glue setup —
  * `CREATE DATABASE IF NOT EXISTS streaming_demo` and an external table
  * over the landed files (docs/athena-integrity-check.md:17,26-39;
  * docs/aws-sso-setup.md:126-142) — re-expressed against Spark's session
  * catalog: `CREATE DATABASE IF NOT EXISTS` + `CREATE TABLE … USING
  * parquet LOCATION`. Both are idempotent (IF NOT EXISTS), matching the
  * reference's re-runnable DDL.
  *
  * Scale note: an external `USING parquet LOCATION` table is metadata-only
  * — no data copy, no scan at DDL time. At 100 TB the difference between
  * a temp view and a catalog table is durability + stats (ANALYZE TABLE
  * can attach CBO row counts), not plan shape: both produce the same
  * FileSourceScanExec with pushdown and pruning.
  */
object Catalog {

  val defaultDb = "graft"

  /** Idempotent namespace create — reference: athena-integrity-check.md:17. */
  def ensureDatabase(spark: SparkSession, db: String = defaultDb): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** Idempotent external-table create over the driver-generated parquet —
    * reference: athena-integrity-check.md:26-39 (external table over
    * `s3://…/names/`; here the LOCATION is URI-parameterized the same way
    * the sinks are: file:// locally, s3a:// in prod). */
  def ensureTable(spark: SparkSession, dir: String, name: String,
      db: String = defaultDb): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $db.$name
         |USING parquet LOCATION '${Tables.path(dir, name)}'""".stripMargin)

  /** DDL for every testdata table; safe to call repeatedly. */
  def ensureAll(spark: SparkSession, dir: String, db: String = defaultDb): Unit = {
    ensureDatabase(spark, db)
    Tables.all.foreach(ensureTable(spark, dir, _, db))
  }

  /** Q1 (scan→project→sort→limit) served through the catalog table instead
    * of a temp view — proves the DDL path answers the reference's first
    * validation query (athena-integrity-check.md:51) end-to-end. Runs the
    * DDL (again) first: the CORRECTNESS entry exercises idempotence on
    * every invocation. */
  def q1ViaCatalog(spark: SparkSession, dir: String, db: String = defaultDb): DataFrame = {
    ensureAll(spark, dir, db)
    spark.sql(
      s"""SELECT c_custkey, c_name, c_acctbal FROM $db.customer
         |ORDER BY c_name ASC, c_custkey ASC LIMIT 20""".stripMargin)
  }
}
