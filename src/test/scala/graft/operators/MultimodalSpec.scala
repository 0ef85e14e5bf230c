package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, the stubbed codec's two
  * forms (expression fast-path vs mapPartitions codec seam) agreeing,
  * frame-sampling shape, and feature determinism.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("media table: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(spark, dir)
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val r = m.select(col("media_id"), length(col("payload")), col("meta.n_bytes")).limit(10)
      .as[(Long, Int, Long)].collect()
    assert(r.nonEmpty && r.forall { case (_, pl, nb) => pl.toLong == nb })
  }

  test("expression probe and mapPartitions codec seam produce identical rows") {
    val a = Multimodal.probe(spark, dir)
      .as[Multimodal.FakeCodec.Probed].collect().sortBy(_.media_id)
    val b = Multimodal.probeViaCodecSeam(spark, dir).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    // all three modality branches actually run
    assert(a.map(_.media_type).toSet == Set("image", "audio", "video"))
  }

  test("frameSample: every-5th ids, 16-byte slices except the tail") {
    val frames = Multimodal.frameSample(spark, dir)
      .as[(Long, Long, Int)].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._2 % 5 == 0), "frame ids must step by the sample rate")
    assert(frames.forall(f => f._3 >= 0 && f._3 <= 16))
    assert(frames.count(_._3 == 16) > 0, "full 16-byte frames expected")
  }

  test("resize: aspect-fit never upscales and the binding dimension hits the target") {
    val r = Multimodal.resize(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Int)].collect()
    assert(r.nonEmpty)
    assert(r.forall(x => Set("image", "video")(x._2)), "audio has no geometry to resize")
    r.foreach { case (_, _, w, h, ow, oh, thumb) =>
      assert(ow <= w && oh <= h, "resize must never upscale")
      assert(ow <= 224 && oh <= 224, "output must fit the target box")
      assert((ow == w && oh == h) || ow == 224L || oh == 224L,
        "either the input already fits, or the binding dimension is exactly the target")
      assert(thumb >= 1 && thumb <= 256)
    }
  }

  test("features: fixed width, [0,1) range, deterministic") {
    val f1 = Multimodal.features(spark, dir).as[(Long, Array[Float])].collect().sortBy(_._1)
    val f2 = Multimodal.features(spark, dir).as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(f1.map(_._2.toSeq).toSeq == f2.map(_._2.toSeq).toSeq)
    assert(f1.forall(_._2.length == 16))
    assert(f1.forall(_._2.forall(v => v >= 0f && v < 1f)))
  }

  test("interleavedSamples: one media item per doc, ordered slots, costs account exactly") {
    val out = Multimodal.interleavedSamples(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect()
    val tokens = graft.operators.TextAnalysis.tokens(
      org.apache.spark.sql.functions.col("text"))
    val nTok = graft.sources.Tables.load(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(tokens).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out.length == nTok.size, "one sample per document")
    out.foreach { case (id, nItems, textTokens, patchCost, manifest) =>
      val items = manifest.split('|').toSeq
      assert(items.length.toLong == nItems)
      val media = items.filterNot(_.startsWith("txt:"))
      assert(media.length == 1, s"doc $id: exactly one media item, got $manifest")
      assert(Set("image", "audio", "video").contains(media.head.split(':')(0)))
      assert(patchCost >= 64 && patchCost < 256, s"doc $id: $patchCost")
      // text costs in the manifest sum to the doc's token count
      val txtSum = items.filter(_.startsWith("txt:")).map(_.split(':')(1).toLong).sum
      assert(txtSum == textTokens && textTokens == nTok(id),
        s"doc $id: manifest $txtSum, column $textTokens, corpus ${nTok(id)}")
      // every text slot carries 1..16 tokens, only the final may be short
      val costs = items.filter(_.startsWith("txt:")).map(_.split(':')(1).toInt)
      assert(costs.dropRight(1).forall(_ == 16) &&
        costs.takeRight(1).forall(c => c >= 1 && c <= 16), s"doc $id: $costs")
    }
  }
}
