package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** First-fit packing held to the exact sequential recurrence, recomputed
  * independently per shard, plus budget/ordering/coverage invariants.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val budget = 256

  test("firstFitPack matches the sequential first-fit recurrence per shard") {
    val packed = Packing.packedChunks(spark, dir, budget, shards = 8)
      .as[Packing.Packed].collect()
    val chunks = TextAnalysis.chunkDocs(spark, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_chunk_tokens"))
      .as[(Long, Int, Int)].collect()
    assert(packed.length == chunks.length, "every chunk packs exactly once")

    // reference implementation: plain Scala first-fit per shard
    val want = chunks
      .map { case (d, c, n) => ((d % 8).toInt, d, c, n) }
      .groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
        var seq = 0L; var fill = 0; var pos = 0
        rows.sortBy(r => (r._2, r._3)).map { case (_, d, c, n) =>
          if (fill > 0 && fill + n > budget) { seq += 1; fill = 0; pos = 0 }
          fill += n
          val out = Packing.Packed(shard, d, c, n, (shard.toLong << 32) | seq, pos)
          pos += 1
          out
        }
      }.toSet
    assert(packed.toSet == want)
  }

  test("packs respect the budget except single oversized chunks; positions are dense") {
    val packed = Packing.packedChunks(spark, dir, budget, shards = 8)
      .as[Packing.Packed].collect()
    packed.groupBy(_.pack_id).foreach { case (id, rows) =>
      val total = rows.map(_.n_tokens).sum
      assert(total <= budget || rows.length == 1,
        s"pack $id holds $total tokens in ${rows.length} chunks")
      assert(rows.map(_.pack_pos).sorted.toSeq == (0 until rows.length),
        s"pack $id positions not dense")
      // chunk order within a pack follows (doc_id, chunk_id)
      val byPos = rows.sortBy(_.pack_pos).map(r => (r.doc_id, r.chunk_id)).toSeq
      assert(byPos == byPos.sorted, s"pack $id out of order")
    }
    // tight packing: no two consecutive packs in a shard could have merged
    packed.groupBy(_.shard).foreach { case (shard, rows) =>
      val packs = rows.groupBy(_.pack_id).toSeq.sortBy(_._1)
      packs.sliding(2).foreach {
        case Seq((_, a), (b_id, b)) =>
          val aTotal = a.map(_.n_tokens).sum
          val bFirst = b.minBy(_.pack_pos).n_tokens
          assert(aTotal + bFirst > budget,
            s"shard $shard: pack $b_id should have started inside the previous pack")
        case _ =>
      }
    }
  }

  test("deterministic across runs and across parallelism") {
    val a = Packing.packedChunks(spark, dir, budget, shards = 8)
      .as[Packing.Packed].collect().toSet
    val chunks = TextAnalysis.chunkDocs(spark, dir).repartition(13) // different input layout
    val b = Packing.firstFitPack(chunks, budget, shards = 8).collect().toSet
    assert(a == b, "packing must not depend on input partitioning")
  }

  // ---- length-bucketed batch assembly ----

  private def txt(n: Int): String = Seq.fill(n)("w").zipWithIndex
    .map { case (w, i) => s"$w$i" }.mkString(" ")

  test("lengthBucketBatches assembles the hand-computable batches exactly") {
    // pad=4, budget=8: counts 3 and 4 share bucket 4 (2 rows/batch),
    // count 5 pads to bucket 8 (1 row/batch), count 20 overflows the
    // budget and still batches alone at its own bucket
    val docs = Seq((0L, txt(3)), (1L, txt(4)), (2L, txt(5)), (3L, txt(20)))
      .toDF("doc_id", "text")
    val got = Packing.lengthBucketBatches(docs, "doc_id", "text",
        pad = 4, budget = 8, salts = 2)
      .select("bucket_len", "batch_id", "n_rows", "sum_tokens",
        "padded_tokens", "pad_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val want = Set(
      (4L, 0L, 2L, 7L, 8L, 1.0 / 8),
      (8L, 0L, 1L, 5L, 8L, 3.0 / 8),
      (20L, 0L, 1L, 20L, 20L, 0.0))
    assert(got == want, s"got $got want $want")
  }

  test("lengthBucketBatches conserves tokens, caps batch sizes, and bounds per-row padding") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val batches = Packing.bucketBatchesDocs(spark, dir).collect()
    val pad = 16; val budget = 512
    val corpusToks = docs.select(
      greatest(size(TextAnalysis.tokens(coalesce(col("text"), lit("")))), lit(1))
        .cast("long").as("n")).agg(sum("n")).head.getLong(0)
    assert(batches.map(_.getAs[Long]("sum_tokens")).sum == corpusToks,
      "every token is in exactly one batch")
    val byBucket = batches.groupBy(_.getAs[Long]("bucket_len"))
    byBucket.foreach { case (bl, bs) =>
      val rowsPer = math.max(budget / bl, 1L)
      assert(bs.forall(_.getAs[Long]("n_rows") <= rowsPer),
        s"bucket $bl exceeds $rowsPer rows")
      assert(bs.count(_.getAs[Long]("n_rows") < rowsPer) <= 1,
        s"bucket $bl has more than one ragged batch")
      bs.foreach { b =>
        val waste = b.getAs[Long]("padded_tokens") - b.getAs[Long]("sum_tokens")
        assert(waste >= 0 && waste < pad * b.getAs[Long]("n_rows"),
          s"per-row padding must be < pad: $b")
      }
    }
  }

  test("lengthBucketBatches is deterministic across input partitioning") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val a = Packing.lengthBucketBatches(docs, "doc_id", "text").collect().toSet
    val b = Packing.lengthBucketBatches(docs.repartition(13), "doc_id", "text")
      .collect().toSet
    assert(a == b, "batch manifest must not depend on input layout")
  }

  test("tokenBlocks matches the sequential concat-and-chunk layout exactly") {
    // blockSize=8, sep=1: counts 5, 10, 2 concatenate with EOS slots,
    // global starts 0, 6, 17 — doc 1 splits across blocks 0/1; doc 2's
    // tokens 17-18 sit whole in block 2 one slot past its boundary
    val docs = Seq((0L, txt(5)), (1L, txt(10)), (2L, txt(2)))
      .toDF("doc_id", "text")
    val got = Packing.tokenBlocks(docs, "doc_id", "text", blockSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (0L, 0L, 0L, 0L, 5L),             // doc 0: tokens 0-4 in block 0
      (0L, 1L, 0L, 6L, 2L),             // doc 1: start 6, tokens 6-7
      (1L, 1L, 2L, 0L, 8L),             // doc 1: tokens 8-15
      (2L, 2L, 0L, 1L, 2L))             // doc 2: start 17, tokens 17-18
    assert(got == want, s"got $got want $want")
  }

  test("maintained token counts reproduce the batch layout on null-text docs") {
    // a null-text admitted doc holds no span but still contributes its
    // EOS slot — under the pre-round-13 tokenCountRows (size(null) = −1)
    // the maintained serve dropped that slot and every later doc's
    // offsets shifted vs the from-text batch layout
    val docs = Seq((1L, "alpha beta gamma"), (2L, null: String),
      (3L, "delta epsilon"))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val direct = Packing.tokenBlocks(docs, "doc_id", "text", blockSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val fromCounts = Packing.tokenBlocksFromCounts(
        TextAnalysis.tokenCountRows(docs, "doc_id", "text", "source")
          .select(col("doc_id"), col("n_tokens").as("n")), blockSize = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fromCounts == direct,
      "counts-fed layout must equal the from-text layout on null-text docs")
  }

  test("tokenBlocksFromCounts survives sparse 64-bit id spans (no bucket overflow)") {
    // snowflake-style ids spanning nearly the whole long range: the
    // round-12 bucket expression ((id−lo)·256) div span overflowed long
    // past ~2^55, flipping buckets negative and scrambling the layout;
    // the divide-by-width form must reproduce the sequential reference
    val ids = Seq(0L, 3L, 1L << 40, 1L << 62, (1L << 62) + 7L,
      Long.MaxValue - 9L)
    val counts = ids.zipWithIndex.map { case (id, i) => (id, (i + 3).toLong) }
    val got = Packing.tokenBlocksFromCounts(
        counts.toDF("doc_id", "n"), blockSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // sequential reference: concat in doc_id order, 1 EOS slot per doc
    var start = 0L
    val want = counts.sortBy(_._1).flatMap { case (d, n) =>
      val s0 = start; start += n + 1
      (s0 / 8 to (s0 + n - 1) / 8).map { blk =>
        val s = math.max(s0, blk * 8)
        val e = math.min(s0 + n - 1, blk * 8 + 7)
        (blk, d, s - s0, s - blk * 8, e - s + 1)
      }
    }.toSet
    assert(got == want, s"got $got want $want")
  }

  test("tokenBlocks tiles the corpus stream: spans conserve tokens, stay in bounds, and are layout-invariant") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val spans = Packing.tokenBlocksDocs(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val blockSize = 128L
    // every document's spans cover exactly its token count, contiguously
    val counts = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(coalesce(col("text"), lit(""))))
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val byDoc = spans.groupBy(_._2)
    assert(byDoc.keySet == counts.filter(_._2 >= 1).keySet,
      "every non-empty document appears; empty ones do not")
    byDoc.foreach { case (d, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.map(_._5).sum == counts(d), s"doc $d spans must sum to its count")
      assert(sorted.head._3 == 0L, s"doc $d must start at doc_off 0")
      sorted.sliding(2).foreach {
        case Array(a2, b2) =>
          assert(a2._3 + a2._5 == b2._3, s"doc $d spans must be contiguous")
          assert(a2._1 + 1 == b2._1, s"doc $d spans must advance one block")
        case _ => ()
      }
    }
    // block occupancy: spans within a block fit and never overlap
    spans.groupBy(_._1).foreach { case (blk, ss) =>
      assert(ss.map(_._5).sum <= blockSize, s"block $blk over-full")
      val occ = ss.sortBy(_._4)
      occ.sliding(2).foreach {
        case Array(a2, b2) =>
          // the gap between consecutive docs in a block is the EOS slot(s)
          assert(a2._4 + a2._5 <= b2._4, s"block $blk spans overlap")
        case _ => ()
      }
      assert(occ.forall(s => s._4 >= 0 && s._4 + s._5 <= blockSize),
        s"block $blk span out of bounds")
    }
    // the global stream is gapless: total slots = Σ(n + 1 EOS per doc)
    val totalSlots = counts.values.map(_ + 1L).sum
    val lastTokenSlot = spans.map(s => s._1 * blockSize + s._4 + s._5 - 1).max
    assert(lastTokenSlot < totalSlots, "spans never pass the stream end")
    // layout invariance: the manifest is a pure function of the data
    val b = Packing.tokenBlocks(docs.repartition(13), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans.toSet == b, "block manifest must not depend on input layout")
  }

  test("curriculumBlocks cuts the phase-ordered stream exactly (sequential reference; phase-monotone)") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val got = Packing.curriculumBlocksDocs(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // sequential reference: curriculum order + counts, one running offset
    val ord = TextAnalysis.curriculumOrder(docs, "doc_id", "text")
      .select("doc_id", "phase", "seq").as[(Long, Long, Long)].collect()
      .sortBy(t => (t._2, t._3))
    val counts = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(coalesce(col("text"), lit(""))))
        .cast("long").as("n")).as[(Long, Long)].collect().toMap
    val bs = 128L
    var off = 0L
    val want = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long, Long)]
    ord.foreach { case (d, p, _) =>
      val n = counts(d)
      if (n >= 1) (off / bs to (off + n - 1) / bs).foreach { blk =>
        val s = math.max(off, blk * bs); val e = math.min(off + n - 1, blk * bs + bs - 1)
        want += ((blk, d, p, s - off, s - blk * bs, e - s + 1))
      }
      off += n + 1
    }
    assert(got.toSet == want.toSet,
      s"curriculum block manifest: got ${got.length} want ${want.size}")
    // the trainer reads phases in order: stream position order must be
    // phase-monotone (the property blocking-before-ordering would break)
    val stream = got.sortBy(s => (s._1, s._5))
    stream.sliding(2).foreach {
      case Array(a, b2) => assert(a._3 <= b2._3,
        s"phase must never decrease along the stream: $a then $b2")
      case _ => ()
    }
  }

  test("curriculumBlocksFromState re-derives ordering and layout off 24-byte/doc metadata") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    def spans(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long, Long, Long)] =
      d.as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // the landed steady serve ≡ the direct operator (shared-oracle law)
    assert(spans(Packing.curriculumBlocksSteadyDocs(spark, dir)) ==
      spans(Packing.curriculumBlocksDocs(spark, dir)),
      "steady serve ≡ direct curriculum layout")
    // re-layout off the SAME state at a new context length and phase
    // count ≡ the direct operator re-run — text untouched either way
    val state = TextAnalysis.curriculumStateRows(docs, "doc_id", "text")
      .localCheckpoint()
    assert(spans(Packing.curriculumBlocksFromState(state,
        blockSize = 64, nPhases = 4)) ==
      spans(Packing.curriculumBlocks(docs, "doc_id", "text",
        blockSize = 64, nPhases = 4)),
      "re-blocking at a new context length/phase count off metadata only")
  }
}
