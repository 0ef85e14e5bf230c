package graft.operators

import graft.SparkTestBase

/** Physical inverted-list layout contract for the landed IVF-PQ code
  * table: the serve scan is bucket-PRUNED to the probed cells (reads
  * (nprobe/|cells|) of the code table — the point of IVF at 100 TB),
  * and the landed serve answer equals the retrain path's.
  */
class IvfPqLayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("landed serve equals the trained rebuild, off the landed catalog tables") {
    val want = Similarity.topKPqIvfTrained(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val got = Similarity.topKPqIvfLanded(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want)
    val prefix = Similarity.quantizerPrefix(dir)
    assert(Seq("_centroids", "_codebook", "_codes")
      .forall(t => spark.catalog.tableExists(s"$prefix$t")))
  }

  test("the landed serve scan bucket-prunes to the probed cells") {
    val served = Similarity.topKPqIvfLanded(spark, dir)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val m = raw"SelectedBucketsCount: (\d+) out of (\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned code-table scan:\n$plan")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"probed cells must select a strict subset of buckets: ${m.get.matched}")
  }
}
