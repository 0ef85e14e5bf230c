package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Margin-based parallel-pair mining between two embedding corpora —
  * the bitext-mining stage of a translation-data pipeline (the public
  * margin criterion of Artetxe & Schwenk, ACL 2019: a candidate pair's
  * cosine is normalized by the mean cosine of each side's k nearest
  * neighbors, so "hub" vectors that are close to everything stop
  * producing false pairs; pairs are kept only when each side is the
  * other's best match — the paper's "intersection" strategy, which
  * needs no tuned threshold).
  *
  * Semantics (pinned by the SQL replay):
  *  - the two "languages" are the deterministic parity split of
  *    `vec_id` (the corpus carries no language column; the operator
  *    under test is the mining recurrence, not the split);
  *  - candidates are CELL-BLOCKED cross-side pairs under the trained
  *    coarse quantizer (the [[Similarity.knnGraph]] blocking — two
  *    vectors compete only if k-means agrees they share a region;
  *    missing a cross-cell pair is IVF's nprobe=1 recall trade);
  *  - margin(x,y) = cos(x,y) / ((avgₖ(x→B) + avgₖ(y→A)) / 2), k = 4,
  *    averaged over each side's top-k same-cell cosines, ROUNDED at
  *    6 dp BEFORE ranking — the rank then compares identical doubles
  *    on both engines (ties broken by partner id), so the argmax can
  *    never flip on a 10⁻¹⁶ summation-order drift;
  *  - mined pairs = mutual best matches (x's argmax is y AND y's
  *    argmax is x); zero-norm vectors (NaN cosine) pair with nothing.
  *
  * Scale shape: the candidate join is a key equi-join on `cell_id`
  * (never all-pairs; per-cell cost bounded by the trainer's balance,
  * AQE skew-split as the degrade); the pair table is persisted so the
  * scoring runs once across its three consumers (two top-k averages +
  * the margin projection); the top-k averages use the codegen
  * `topk_by` k-cut (at most k rows per vector per partition cross the
  * exchange); both argmaxes are bounded [[graft.plans.TopKPerKey]]
  * cuts, and the mutual filter is an equi-join on the (src, tgt) pair
  * key. Embeddings cross the shuffle once (into the cell join);
  * everything downstream is id+double rows. */
object Bitext {

  /** Mine mutual-best margin pairs between the even (side A) and odd
    * (side B) `vec_id` halves of `emb`, blocked by `centroids`. */
  def mineMarginPairs(emb: DataFrame, centroids: DataFrame,
      k: Int = 4): DataFrame = {
    val (coarseLive, grouped) = Similarity.hierIndex(centroids)
    mineMarginPairsWith(emb, coarseLive, grouped, k)
  }

  /** [[mineMarginPairs]] against a PREBUILT (or landed) two-level
    * assignment index — the steady serve's form. */
  def mineMarginPairsWith(emb: DataFrame, coarseLive: DataFrame,
      grouped: DataFrame, k: Int = 4): DataFrame = {
    // two-level assignment (round-14 adoption — k ∝ N under the trained
    // sizing; see Similarity.ivfAssignHier for the recall trade)
    val asg = Similarity.ivfAssignHierWith(emb, coarseLive, grouped)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = asg.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id").as("src_id"), col("cell_id"),
        col("embedding").as("a_emb"))
    val b = asg.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("tgt_id"), col("cell_id"),
        col("embedding").as("b_emb"))
    val pairs = a.join(b, Seq("cell_id"))
      .select(col("src_id"), col("tgt_id"),
        GraftFunctions.cosineSim(col("a_emb"), col("b_emb")).as("score"))
      .filter(!isnan(col("score")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def topAvg(key: String, other: String, out: String): DataFrame =
      pairs.groupBy(col(key).as("query_id"))
        .agg(GraftFunctions.topKBy(col("score"), col(other), k).as("top"))
        .select(col("query_id"), explode(col("top")).as("t"))
        .groupBy("query_id").agg(avg(col("t.score")).as(out))
    // persisted: both mutual-best cuts below consume margins, and the
    // margin join (two topAvg window aggregates + the three-way join)
    // must run once, not once per cut
    val margins = pairs
      .join(topAvg("src_id", "tgt_id", "ax")
        .withColumnRenamed("query_id", "src_id"), Seq("src_id"))
      .join(topAvg("tgt_id", "src_id", "bx")
        .withColumnRenamed("query_id", "tgt_id"), Seq("tgt_id"))
      .select(col("src_id"), col("tgt_id"),
        round(col("score") / ((col("ax") + col("bx")) / lit(2.0)), 6)
          .as("margin"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val bestA = graft.plans.TopKPerKey(margins, Seq("src_id"),
      Seq(col("margin").desc, col("tgt_id").asc), 1)
    val bestB = graft.plans.TopKPerKey(margins, Seq("tgt_id"),
      Seq(col("margin").desc, col("src_id").asc), 1)
      .select("src_id", "tgt_id")
    val out = bestA.join(bestB, Seq("src_id", "tgt_id"))
      .select("src_id", "tgt_id", "margin")
    // materialize-and-release (the knnGraph contract)
    if (sys.props.get("graft.dedup.lazyPlans").contains("true")) out
    else {
      val reliable = out.sparkSession.sparkContext.getCheckpointDir.isDefined
      val fin = if (reliable) out.checkpoint() else out.localCheckpoint()
      margins.unpersist(); pairs.unpersist(); asg.unpersist()
      fin
    }
  }

  /** CORRECTNESS instantiation: mined pairs under the TRAINED cells
    * (same centroids, same oracle CTEs as `sim_kmeans`). */
  def mineDocs(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    mineMarginPairs(emb, Similarity.kmeansCentroidsAuto(emb), k)
  }

  /** STEADY-STATE [[mineDocs]]: cells AND the two-level assignment
    * index from the LANDED artifacts — no Lloyd's anywhere in the
    * plan; the timed cost is the two-stage assignment + blocked
    * scoring + the margin algebra, the recurring production mine. Same
    * answer, same oracle. */
  def mineSteady(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (coarseLive, grouped) = Similarity.loadLandedHierIndex(spark, dir)
    mineMarginPairsWith(emb, coarseLive, grouped, k)
  }
}
