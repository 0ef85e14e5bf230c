package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — greedy first-fit of chunk token counts into
  * fixed-budget bins, the step between [[TextAnalysis.chunkDocs]] and a
  * trainer that wants ~budget-token examples with minimal padding.
  *
  * First-fit is inherently sequential (each decision depends on the
  * running fill), so there is no window-function closed form — this is the
  * one operator family where `mapPartitions` is the right tool (the
  * custom-operator ladder's last rung, used for genuinely per-partition
  * imperative logic). The scale story is the secondary-sort pattern:
  * one shuffle routes each shard to a partition, an in-partition
  * (spillable) sort orders it, and a single streaming pass assigns packs —
  * state is three integers, never the shard's rows. Shards are
  * hash(doc_id) so they stay balanced at any corpus size; packing is
  * deterministic per shard regardless of parallelism.
  */
object Packing {

  case class Chunk(shard: Int, doc_id: Long, chunk_id: Int, n_tokens: Int)
  case class Packed(shard: Int, doc_id: Long, chunk_id: Int, n_tokens: Int,
      pack_id: Long, pack_pos: Int)

  /** Pack `chunks` (doc_id, chunk_id, n_chunk_tokens) into bins of at most
    * `budget` tokens, first-fit in (doc_id, chunk_id) order within
    * `shards` hash shards. A single chunk larger than the budget gets its
    * own (overflowing) bin rather than being dropped. pack_id is unique
    * across shards (shard in the high 32 bits). */
  def firstFitPack(chunks: DataFrame, budget: Int, shards: Int = 32): Dataset[Packed] = {
    require(budget > 0 && shards > 0)
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks
      .select(
        pmod(col("doc_id"), lit(shards)).cast("int").as("shard"),
        col("doc_id"),
        col("chunk_id").cast("int").as("chunk_id"),
        col("n_chunk_tokens").cast("int").as("n_tokens"))
      .as[Chunk]
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id", "chunk_id")
      .mapPartitions { it =>
        // a partition holds whole shards (hash-routed), sorted by shard
        // first — reset the running state at every shard boundary
        var curShard = -1
        var seq = 0L; var fill = 0; var pos = 0
        it.map { c =>
          if (c.shard != curShard) {
            curShard = c.shard; seq = 0L; fill = 0; pos = 0
          } else if (fill + c.n_tokens > budget && fill > 0) {
            seq += 1; fill = 0; pos = 0
          }
          fill += c.n_tokens
          val out = Packed(c.shard, c.doc_id, c.chunk_id, c.n_tokens,
            (c.shard.toLong << 32) | seq, pos)
          pos += 1
          out
        }
      }
  }

  /** The testdata entry: chunk `documents` (32-token windows, stride 24)
    * and pack into 256-token bins over 8 shards. */
  def packedChunks(spark: SparkSession, dir: String,
      budget: Int = 256, shards: Int = 8): DataFrame = {
    import spark.implicits._
    firstFitPack(TextAnalysis.chunkDocs(spark, dir), budget, shards)
      .toDF()
  }
}
