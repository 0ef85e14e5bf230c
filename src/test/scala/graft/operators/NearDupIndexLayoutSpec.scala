package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Probe-aligned index layout contract: a signature index landed with
  * landNearDupIndex serves the arrival probe with NO index-side Exchange
  * (the band table's bucketing satisfies the join's required
  * distribution), and with survivors identical to the from-scratch path.
  */
class NearDupIndexLayoutSpec extends SparkTestBase {
  import spark.implicits._

  import graft.TestDocs.doc

  private lazy val corpus: DataFrame =
    (1 to 30).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
  private lazy val batch: DataFrame = Seq(
    (101L, doc(101)),          // fresh
    (102L, doc(7) + " pad"),   // near-dup of landed doc 7
  ).toDF("doc_id", "text")

  private val tmp = java.nio.file.Files.createTempDirectory("graft-ndidx").toString

  private lazy val landed: (DataFrame, DataFrame) = {
    Dedup.landNearDupIndex(
      Dedup.buildNearDupIndex(corpus, "doc_id", "text"), "nd_idx", s"$tmp/nd_idx")
    (spark.table("nd_idx_bands"), spark.table("nd_idx_sh"))
  }

  test("landed probe equals the from-scratch path") {
    val (bandsT, shT) = landed
    val got = Dedup.incrementalNearNewBanded(bandsT, shT, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val want = Dedup.incrementalNearNew(
      Dedup.buildNearDupIndex(corpus, "doc_id", "text"), batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && got == Set(101L))
  }

  test("the band probe join plans no Exchange on the bucketed index side") {
    val (bandsT, _) = landed
    val bIdx = Dedup.buildNearDupIndex(batch, "doc_id", "text")
    // force the shuffle-join path (the broadcast plan trivially has no
    // index-side shuffle; the at-scale plan is the one to pin)
    val probe = Dedup.bandHashTable(bIdx, k = 128, bands = 32).hint("merge")
      .join(bandsT, Seq("band", "bh"))
      .select("band", "bh")
    probe.collect()
    // the adaptive plan string repeats the tree under "== Initial Plan ==";
    // count Exchanges in the executed (final) section only
    val plan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly the probe-side Exchange (index side bucketed):\n$plan")
  }

  test("steady-state instantiation equals the rebuild instantiation, and reuses its land") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: DataFrame) = df.as[(Long, String)].collect().toSet
    val want = rows(Dedup.incrementalNearArrivals(spark, dir))
    val first = rows(Dedup.incrementalNearArrivalsSteady(spark, dir))
    assert(first == want)
    // second call must hit the already-landed catalog tables (no re-land):
    // same answer, and the bucketed band table still exists in the catalog
    val again = rows(Dedup.incrementalNearArrivalsSteady(spark, dir))
    assert(again == want)
    val prefix = Dedup.steadyIndexPrefix(dir)
    assert(spark.catalog.tableExists(s"${prefix}_bands") &&
      spark.catalog.tableExists(s"${prefix}_sh"))
  }
}
