package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Continuous ENTITY RESOLUTION — the streaming face of
  * [[graft.operators.Dedup.resolveEntities]], the [[StreamNearDedup]] /
  * [[StreamIvfPq]] index discipline applied to record linkage: arriving
  * records probe a disk-resident deletion-variant index
  * ([[graft.operators.Dedup.deletionVariants]] rows) instead of
  * re-blocking the whole corpus per batch, so the expensive half of
  * linkage — candidate generation — is incremental. Per micro-batch:
  *
  *  1. land the batch's records (id, name, payload) as
  *     `stateDir/records/gen-<id>` — the durable base the survivorship
  *     read folds over;
  *  2. block: the batch's variant rows probe the accumulated variant
  *     index (EXCLUDING the batch's own generation — replay protection)
  *     plus themselves (within-batch pairs), candidate ids distinct,
  *     names fetched back through narrow joins against the landed
  *     records, exact `levenshtein ≤ 1` confirm
  *     ([[graft.operators.Dedup.confirmLinkPairs]]);
  *  3. land the discovered pairs as `stateDir/pairs/gen-<id>` and the
  *     batch's variant rows as `stateDir/variants/gen-<id>` (idempotent
  *     Overwrite: all three writes are deterministic given the landed
  *     prior state, so a replayed batch rewrites byte-identically);
  *  4. at `compactEvery` cadence, fold each side's generations
  *     ([[compactState]]) inside the serial batch loop.
  *
  * Every pair (x, y) is discovered exactly once — at the batch where its
  * LATER side arrives, whose variants meet the earlier side's in the
  * index — so the accumulated pair set equals the batch operator's
  * `deletionLinkPairs` over the union of all arrivals, and
  * [[canonicalEntities]] (transitive clusters + survivorship over the
  * live records and pairs) equals batch `resolveEntities` on that union
  * (StreamLinkSpec pins the law, cross-restart and across compaction).
  *
  * Cluster STATE is the pair set, not materialized labels: component
  * labels are not mergeable generation-by-generation (a late pair can
  * fuse two old clusters — label state would need the full relabel
  * anyway), while edges fold trivially. Survivorship counts
  * (`n_members`) are NOT duplication-inert, so all three sides compact
  * with the MANIFESTED fold ([[Generations.compactManifested]]) and
  * every reader resolves manifests ([[Generations.live]]).
  *
  * Scale shape per batch: variant explode is |name|-bounded scan-side
  * work on the BATCH only; the probe shuffles (variant, id) rows of
  * batch × accumulated-index; the confirm touches candidate ids only.
  * The serve-side CC runs over the accumulated PAIR set — bounded by
  * linkage degree, not corpus text — with the alternating-star cost
  * ceiling documented on [[graft.operators.Dedup.connectedComponents]].
  */
object StreamLink {

  private def recordsDir(stateDir: String) = s"$stateDir/records"
  private def variantsDir(stateDir: String) = s"$stateDir/variants"
  private def pairsDir(stateDir: String) = s"$stateDir/pairs"

  /** Live (manifest-resolved) union of one side's generations. */
  private def readSide(spark: SparkSession, dir: String,
      template: => DataFrame): DataFrame = {
    val names = Generations.live(spark, dir)
    if (names.isEmpty) template
    else Generations.readNames(spark, dir, names, "gen-")
  }

  /** Every live landed record — the continuously-growing base table. */
  def currentRecords(spark: SparkSession, stateDir: String,
      template: => DataFrame): DataFrame =
    readSide(spark, recordsDir(stateDir), template)

  /** Every live discovered (id_a, id_b, dist) link. */
  def currentPairs(spark: SparkSession, stateDir: String): DataFrame = {
    import spark.implicits._
    readSide(spark, pairsDir(stateDir),
      Seq.empty[(Long, Long, Long)].toDF("id_a", "id_b", "dist"))
  }

  /** Start resolving `records` (a streaming DataFrame carrying `idCol`,
    * `nameCol`, and any payload columns the survivorship rule needs)
    * into the linkage state at `stateDir`. */
  def start(records: DataFrame, stateDir: String, checkpoint: String,
      idCol: String, nameCol: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery =
    records.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val own = s"gen-$id"
        batch.write.mode(SaveMode.Overwrite)
          .parquet(s"${recordsDir(stateDir)}/$own")
        val normBatch = batch.select(col(idCol).cast("long").as("id"),
          col(nameCol).as("name"))
        val vB = Dedup.deletionVariants(normBatch)
        val prior = Generations.live(spark, variantsDir(stateDir))
          .filterNot(_ == own)
        val vAll =
          if (prior.isEmpty) vB
          else vB.unionByName(Generations.readNames(
            spark, variantsDir(stateDir), prior, "gen-"))
        // candidates: one side in THIS batch, the other anywhere arrived;
        // normalized to (min, max) so cross-batch id order can't matter
        val cand = vB.select(col("variant"), col("id").as("id_x"))
          .join(vAll.select(col("variant"), col("id").as("id_y")), Seq("variant"))
          .filter(col("id_x") =!= col("id_y"))
          .select(least(col("id_x"), col("id_y")).as("id_a"),
            greatest(col("id_x"), col("id_y")).as("id_b"))
          .distinct()
        val landedNames = currentRecords(spark, stateDir, template = batch)
          .select(col(idCol).cast("long").as("id"), col(nameCol).as("name"))
        Dedup.confirmLinkPairs(cand, landedNames)
          .write.mode(SaveMode.Overwrite)
          .parquet(s"${pairsDir(stateDir)}/$own")
        vB.write.mode(SaveMode.Overwrite)
          .parquet(s"${variantsDir(stateDir)}/$own")
        if (compactEvery > 0 && id % compactEvery == compactEvery - 1)
          compactState(spark, stateDir)
        ()
      }
      .start()

  /** Fold each side's accumulated generations (manifested — see the
    * object scaladoc; identity folds: all three sides are append-only
    * and exactly-once by the replay discipline). */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    Generations.compactManifested(spark, recordsDir(stateDir), identity)
    Generations.compactManifested(spark, variantsDir(stateDir), identity)
    Generations.compactManifested(spark, pairsDir(stateDir), identity)
  }

  /** The canonical entity set over everything arrived so far —
    * transitive typo clusters + survivorship under `score`, exactly
    * [[graft.operators.Dedup.resolveEntities]]'s policy close applied to
    * the live landed records and accumulated pair set. Returns
    * (idCol, component, n_members) — canonical records only. */
  def canonicalEntities(spark: SparkSession, stateDir: String,
      idCol: String, score: Column): DataFrame = {
    val recs = currentRecords(spark, stateDir,
      template = throw new IllegalStateException(
        s"no committed record generation under ${recordsDir(stateDir)}"))
    val pairs = currentPairs(spark, stateDir)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    Dedup.keepBestPerCluster(recs, pairs, idCol, score)
  }
}
