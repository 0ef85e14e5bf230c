package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Arrival-time containment gate: the asymmetric drop semantics (excerpt
  * dropped, SUPERSET kept, mutual ties keep-smallest), landed-layout
  * parity with the from-scratch path, and the no-index-side-Exchange
  * probe contract of the shingle-bucketed posting table.
  */
class ContainIndexSpec extends SparkTestBase {
  import spark.implicits._

  import graft.TestDocs.doc

  private lazy val corpus: DataFrame =
    (1 to 30).map(i => (i.toLong, doc(i, n = 40))).toDF("doc_id", "text")

  // excerpt of landed 5 (drop), superset of landed 9 (KEEP — new
  // content), fresh doc (keep), within-batch excerpt of 101 (drop),
  // exact-dup pair 103/104 (keep 103)
  private lazy val batch: DataFrame = Seq(
    (101L, doc(101, n = 40)),
    (102L, doc(5, n = 40).split(" ").take(15).mkString(" ")),
    (103L, doc(103, n = 40)),
    (104L, doc(103, n = 40)),
    (105L, doc(9, n = 40) + " " + doc(205, n = 30)),
    (106L, doc(101, n = 40).split(" ").take(14).mkString(" ")),
  ).toDF("doc_id", "text")

  private val tmp = java.nio.file.Files.createTempDirectory("graft-ctidx").toString

  private lazy val landed: (DataFrame, DataFrame) = {
    Dedup.landContainmentIndex(
      Dedup.containmentIndexRows(corpus, "doc_id", "text"),
      "ct_idx", s"$tmp/ct_idx")
    (spark.table("ct_idx_post"), spark.table("ct_idx_sh"))
  }

  test("drop semantics: excerpts drop, supersets and fresh docs survive, ties keep smallest") {
    val (postT, shT) = landed
    val got = Dedup.incrementalContainmentNew(postT, shT, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(101L, 103L, 105L), s"got $got")
  }

  test("landed probe equals the from-scratch posting path") {
    val (postT, shT) = landed
    val idx = Dedup.containmentIndexRows(corpus, "doc_id", "text")
    val scratch = Dedup.incrementalContainmentNew(
      idx.select(col("doc_id"), col("sz"),
        org.apache.spark.sql.functions.explode(col("sh")).as("shingle")),
      idx, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val landedOut = Dedup.incrementalContainmentNew(postT, shT, batch,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(landedOut == scratch)
  }

  test("the posting probe join plans no Exchange on the bucketed index side") {
    val (postT, _) = landed
    val bIdx = Dedup.containmentIndexRows(batch, "doc_id", "text")
    val probe = bIdx
      .select(col("doc_id"), org.apache.spark.sql.functions.explode(col("sh")).as("shingle"))
      .hint("merge")
      .join(postT, Seq("shingle"))
      .select("shingle")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly the probe-side Exchange (index side bucketed):\n$plan")
  }

  test("steady-state instantiation equals the rebuild instantiation, and reuses its land") {
    val dir = "/root/testdata/sf0.001"
    def rows(df: DataFrame) = df.as[(Long, String)].collect().toSet
    val want = rows(Dedup.incrementalContainArrivals(spark, dir))
    val first = rows(Dedup.incrementalContainArrivalsSteady(spark, dir))
    assert(first == want)
    val again = rows(Dedup.incrementalContainArrivalsSteady(spark, dir))
    assert(again == want)
    val prefix = Dedup.steadyContainPrefix(dir)
    assert(spark.catalog.tableExists(s"${prefix}_post") &&
      spark.catalog.tableExists(s"${prefix}_sh"))
  }
}
