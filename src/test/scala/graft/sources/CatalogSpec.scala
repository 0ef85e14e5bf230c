package graft.sources

import graft.SparkTestBase

/** S8/Q6 catalog DDL: CREATE DATABASE / CREATE TABLE IF NOT EXISTS
  * idempotence and serving Q1 through the catalog table instead of a temp
  * view (reference DDL: docs/athena-integrity-check.md:17,26-39).
  */
class CatalogSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  test("DDL is idempotent: database + tables created twice without error") {
    Catalog.ensureAll(spark, dir, db = "graft_test")
    Catalog.ensureAll(spark, dir, db = "graft_test") // IF NOT EXISTS → no-op
    val tables = spark.sql("SHOW TABLES IN graft_test").collect().map(_.getString(1)).toSet
    assert(Tables.all.toSet.subsetOf(tables))
  }

  test("catalog table is external: location points at the source parquet, no copy") {
    Catalog.ensureAll(spark, dir, db = "graft_test")
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_test.customer")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("Location").contains("customer.parquet"))
  }

  test("q1 via catalog table matches q1 via temp-view path") {
    val viaCatalog = Catalog.q1ViaCatalog(spark, dir, db = "graft_test").collect().toSeq
    val viaView = graft.operators.RefQueries.sortLimit(spark, dir).collect().toSeq
    assert(viaCatalog == viaView)
    assert(viaCatalog.size == 20)
  }
}
