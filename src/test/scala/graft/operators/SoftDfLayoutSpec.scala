package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe-aligned df-index layout contract (the E190 claim): a gram→df
  * relation landed with landGramDfIndex serves the weight join with NO
  * index-side Exchange — the `gh` bucketing satisfies the join's
  * required distribution, so only the serve-side gram explosion
  * shuffles — and the served weights equal the direct corpus-aggregate
  * path exactly.
  */
class SoftDfLayoutSpec extends SparkTestBase {
  import spark.implicits._

  import graft.TestDocs.doc

  private lazy val corpus: DataFrame =
    (1 to 30).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")

  private val tmp =
    java.nio.file.Files.createTempDirectory("graft-softdfidx").toString

  private lazy val landedDf: DataFrame = {
    Dedup.landGramDfIndex(corpus, "doc_id", "text", "softdf_idx",
      s"$tmp/softdf_idx")
    spark.table("softdf_idx_df")
  }

  test("landed-df weights equal the direct corpus-aggregate path") {
    val got = Dedup.softWeightsFromDf(
      corpus.select(col("doc_id"),
        explode(array_distinct(Dedup.shingleHashes(col("text"), 3))).as("gh")),
      landedDf)
      .as[(Long, Long, Double, Double)].collect().toSet
    val want = Dedup.softDedupWeights(corpus, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == want)
  }

  test("the weight join plans no Exchange on the bucketed df side") {
    val ex = corpus.select(col("doc_id"),
      explode(array_distinct(Dedup.shingleHashes(col("text"), 3))).as("gh"))
    // force the shuffle-join path (the broadcast plan trivially has no
    // index-side shuffle; the at-scale plan is the one to pin)
    val probe = ex.hint("merge").join(landedDf, "gh").select("doc_id", "df")
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected exactly the serve-side Exchange (df side bucketed):\n$plan")
  }
}
