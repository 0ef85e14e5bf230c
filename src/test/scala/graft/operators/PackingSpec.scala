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
}
