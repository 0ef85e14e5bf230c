package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Chunking and TF-IDF invariants, re-derived from the raw token arrays. */
class TextChunkTfidfSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunkDocs: stride/overlap geometry reconstructs every document") {
    val chunk = 32; val stride = 24
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .as[(Long, Seq[String])].collect().toMap
    val chunks = TextAnalysis.chunkDocs(spark, dir, chunk, stride)
      .as[(Long, Int, String, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    assert(chunks.keySet == toks.keySet, "every doc must chunk, even short ones")
    chunks.foreach { case (id, cs) =>
      val w = toks(id)
      val expected = math.max(1, math.ceil((w.length - chunk).toDouble / stride).toInt + 1)
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks, want $expected")
      cs.foreach { case (_, i, text, n) =>
        val want = w.slice(i * stride, i * stride + chunk)
        assert(text == want.mkString(" "), s"doc $id chunk $i content")
        assert(n == want.length)
      }
      // coverage: the last chunk reaches the document's end
      val (_, last, _, lastN) = cs.last
      assert(last * stride + lastN == w.length || lastN == chunk,
        s"doc $id: token tail uncovered")
      assert(last * stride + chunk >= w.length, s"doc $id: final window short of the end")
    }
  }

  test("termStats: df/tf/idf agree with a direct recount") {
    val stats = TextAnalysis.termStats(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(stats.nonEmpty)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("w"))
      .as[(Long, Seq[String])].collect()
    val n = docs.length.toDouble

    val df = docs.flatMap { case (_, w) => w.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tf = docs.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

    assert(stats.map(_._1).toSet == df.keySet)
    stats.foreach { case (term, gotDf, gotTf, gotIdf) =>
      assert(gotDf == df(term), s"$term df")
      assert(gotTf == tf(term), s"$term tf")
      assert(gotDf <= gotTf)
      val wantIdf = BigDecimal(math.log(n / gotDf))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gotIdf - wantIdf) < 1e-9, s"$term idf $gotIdf vs $wantIdf")
    }
  }
}
