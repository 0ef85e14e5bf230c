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

  // ── √N-sized family (round 12): the production sizing demonstrated ──

  test("scaled sizing: ≈√N trained cells, bucket fan-out grown to match") {
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    val stride = Similarity.scaledInitEvery(n)
    assert(stride == math.round(math.sqrt(n.toDouble)).toInt,
      s"stride must be round(√N), got $stride for n=$n")
    val (centDf, _) = Similarity.loadLandedQuantizersScaled(spark, dir)
    val cells = centDf.count()
    // seeds = ceil(N/stride) ≈ √N; Lloyd's drops only emptied cells, so
    // the trained count stays within a few of the seed count
    val seeds = (0L until n).count(_ % stride == 0)
    assert(cells <= seeds && cells >= seeds / 2,
      s"trained cells $cells should track the ≈√N seed count $seeds")
    // the landed fan-out is one bucket per cell at test scale (capped at
    // maxBuckets for production cell counts), vs the fixed family's 16:
    // probed reads scale with N/cells = √N instead of N/16
    Similarity.ensureIvfPqCodesScaled(spark, dir)
    val served = Similarity.topKPqIvfLandedScaled(spark, dir)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val m = raw"SelectedBucketsCount: (\d+) out of (\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned scaled code scan:\n$plan")
    assert(m.get.group(2).toInt == math.min(cells, 256L).toInt,
      s"scaled fan-out must track the cell count: ${m.get.matched}, cells=$cells")
    // |Q|=5 probes at nprobe=4 touch ≤20 distinct cells; with one cell
    // per bucket the scan selects exactly the probed cells' buckets — a
    // strict subset that stays ≤|Q|·nprobe as the corpus (and with it
    // the bucket count) grows
    assert(m.get.group(1).toInt <= 20 &&
      m.get.group(1).toInt < m.get.group(2).toInt,
      s"probed buckets must be ≤|Q|·nprobe and a strict subset: ${m.get.matched}")
  }

  test("scaled landed serves equal a from-scratch rebuild at the scaled sizing") {
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val stride = Similarity.scaledInitEvery(emb.count())
    val cents = Similarity.kmeansCentroids(emb, initEvery = stride)
    val book = Similarity.loadLandedQuantizers(spark, dir)._2
    val want = Similarity.topKPqIvfWith(emb, Similarity.defaultQueries(emb),
        k = 5, nprobe = 4, m = 8, subDim = 8, cents, book)
      .as[(Long, Long, Double)].collect().toSet
    assert(Similarity.topKPqIvfLandedScaled(spark, dir)
      .as[(Long, Long, Double)].collect().toSet == want,
      "scaled landed ADC serve must equal the retrain answer")
    val wantRef = Similarity.refinedSearchIndex(emb,
        Similarity.ivfPqIndexRows(emb, 8, 8, cents, book),
        Similarity.defaultQueries(emb), k = 5, r = 4, nprobe = 4,
        m = 8, subDim = 8, cents, book)
      .as[(Long, Long, Double)].collect().toSet
    assert(Similarity.topKPqIvfRefinedLandedScaled(spark, dir)
      .as[(Long, Long, Double)].collect().toSet == wantRef,
      "scaled refined serve must equal the retrain refine answer")
  }
}
