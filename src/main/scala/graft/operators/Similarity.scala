package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding
  * array<float>, label): brute-force top-k cosine as the exact baseline,
  * and a random-hyperplane-LSH bucketed variant as the approximate scale
  * path. Extends the reference per the BASELINE north star (the reference
  * itself has no vector surface).
  *
  * Scale design (100 TB of vectors):
  *  - the QUERY set is small by contract (a handful of probe vectors) —
  *    it is explicitly broadcast; the corpus side streams through the
  *    scan and is never shuffled for scoring;
  *  - scoring is the codegen'd `cosine_sim` kernel — no UDF boxing, runs
  *    inside the scan stage;
  *  - brute force scores |Q|·N pairs; the LSH variant only scores pairs
  *    that collide in ≥1 hyperplane-sign bucket, trading recall for a
  *    corpus-scan-sized (not |Q|·N) candidate set.
  */
object Similarity {

  /** Overlap two INDEPENDENT driver-side job chains (guide §2.6): `side`
    * runs on a dedicated thread that explicitly inherits the caller's
    * job description (a shared ForkJoinPool inherits local properties
    * nondeterministically — the r17 advisory: bench:<name> attribution
    * went missing on the overlapped trainer's jobs), `main` runs on the
    * calling thread, and the side chain is AWAITED even when `main`
    * throws, so a failure cannot leak a still-submitting orphan chain.
    * FIFO scheduling back-fills each chain's stage tails with the
    * other's tasks; results are the same two computations, unchanged. */
  private[graft] def overlapJobs[A, B](spark: SparkSession)(side: => A)(
      main: => B): (A, B) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val sc = spark.sparkContext
    val desc = sc.getLocalProperty("spark.job.description")
    val exec = java.util.concurrent.Executors.newSingleThreadExecutor()
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(exec)
    val f = Future { sc.setJobDescription(desc); side }
    try {
      val b = main
      (Await.result(f, Duration.Inf), b)
    } finally {
      try { Await.ready(f, Duration.Inf); () }
      catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      exec.shutdown()
    }
  }

  /** The default probe ids — a FIXED literal set, because the operator
    * family's contract is "query set small by contract, explicitly
    * broadcast". A fraction-of-the-corpus probe set (e.g. every 100th
    * vector) would broadcast 1% of a 100 TB corpus; a fixed id list stays
    * the same handful of vectors at any SF. (The ids are the sf0.01
    * instantiation of the old every-100th rule, so correctness hashes are
    * unchanged.) */
  val defaultProbeIds: Seq[Long] = Seq(0L, 100L, 200L, 300L, 400L)

  /** Default probe set: the [[defaultProbeIds]] vectors, as
    * (query_id, q_emb) — bounded regardless of corpus size. */
  def defaultQueries(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id").isin(defaultProbeIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  def topKCosine(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    topKCosine(emb, defaultQueries(emb), k)
  }

  /** Exact top-k: broadcast the query vectors, score every (query, corpus)
    * pair with cosine, keep k best per query. The k-cut is the native
    * `topk_by` partial-merge aggregate ([[graft.functions.TopKByScore]]):
    * each partition forwards at most k pairs per query, so the shuffle
    * carries |Q|·k·partitions rows instead of the |Q|·N a rank window
    * would sort — scoring stays a full corpus scan (that is what "exact"
    * costs; the LSH/IVF paths below are the sub-scan answers). NaN scores
    * (zero-norm junk vectors) are skipped inside the aggregate. */
  def topKCosine(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
    topKCut(scored, k)
  }

  /** HARD-negative mining — the contrastive-training complement of the
    * md5-uniform RANDOM negatives ([[Contrastive]], E55): the published
    * dense-retrieval recipe (DPR class) wants the most-similar
    * NON-duplicates as negatives — similar enough to be informative,
    * but anything above `dupCeil` is a probable duplicate/positive and
    * would poison the loss as a false negative. One band filter over
    * the same scored pairs as [[topKCosine]], then the same
    * pre-exchange `topk_by` cut; NaN (zero-norm junk) is excluded by
    * the explicit band test, so the band — not the aggregate — is the
    * documented NaN gate here. */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int,
      dupCeil: Double): DataFrame = {
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
      .filter(!isnan(col("score")) && col("score") < dupCeil)
    topKCut(scored, k)
  }

  /** CORRECTNESS instantiation: 5 hard negatives per default probe,
    * duplicate ceiling 0.95. */
  def hardNegativeDocs(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    hardNegatives(emb, defaultQueries(emb), k = 5, dupCeil = 0.95)
  }

  /** The shared k-cut: topk_by aggregate → explode back to rows. */
  private def topKCut(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(GraftFunctions.topKBy(col("score"), col("vec_id"), k).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("vec_id"), col("t.score").as("score"))

  /** The deterministic hyperplane set: seeded gaussians, computed as plan
    * literals (planes × dim doubles — a few KiB of constants, not data).
    * Public so the correctness oracle can embed the SAME planes as SQL
    * literals and reproduce the signature bit-for-bit. */
  def planeVectors(planes: Int = 16, dim: Int = 64): Seq[Array[Double]] = {
    val rng = new scala.util.Random(0x5eed)
    Seq.fill(planes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Random-hyperplane signature: `planes` sign bits of dot products with
    * seeded deterministic hyperplanes, packed into band buckets of
    * `bitsPerBand` bits. Cosine-similar vectors agree on most sign bits,
    * so near neighbors collide in some band w.h.p. (SimHash for vectors —
    * Charikar's rounding scheme). Hyperplane components come from
    * [[planeVectors]]' fixed seed, so the signature is reproducible
    * cluster-wide (and oracle-side) without shipping a matrix. */
  def hyperplaneBands(emb: DataFrame,
      planes: Int = 16, bitsPerBand: Int = 4, dim: Int = 64): DataFrame = {
    require(planes % bitsPerBand == 0, "bitsPerBand must divide planes")
    val planeVecs = planeVectors(planes, dim)
    val sigBits = planeVecs.zipWithIndex.map { case (v, p) =>
      val dot = aggregate(
        zip_with(col("embedding"), typedlit(v.toSeq), (x, c) => x * c),
        lit(0.0d), (acc, t) => acc + t)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    val sig = sigBits.reduce(_.bitwiseOR(_))
    val nBands = planes / bitsPerBand
    val mask = (1L << bitsPerBand) - 1
    emb.select(col("*"), sig.as("hsig"))
      .select(
        col("*"),
        posexplode(array((0 until nBands).map(b =>
          shiftright(col("hsig"), b * bitsPerBand).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Collect a bounded centroid frame to driver arrays for the scan-side
    * argmax ([[graft.functions.NearestCellId]]). Same byte budget as the
    * `broadcast(centroids)` it replaces — a broadcast relation is
    * collected to the driver before shipping — paid at the SAME sites
    * (every argmax side here is bounded by the r15 sizing contract:
    * ≤ [[FlatTrainerMaxSeeds]] trainer frontiers, √N IVF cell sets, ⌈√k⌉
    * coarse levels). Sorted by id so the expression fingerprint — and
    * the argmax scan order — is deterministic. */
  private def collectCellArrays(cents: DataFrame, idCol: String,
      embCol: String): (Array[Long], Array[Array[Float]]) = {
    // null centroid embeddings are dropped (r17 advisory): in the
    // crossJoin+max_by form a null cosine never won the argmax, so
    // skipping the row is value-identical — and getSeq would NPE on it
    val rows = cents.select(col(idCol).cast("long"), col(embCol))
      .filter(col(embCol).isNotNull).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    (rows.map(_._1), rows.map(_._2))
  }

  /** Rebuild a (cell_id, c_emb) centroid frame from driver arrays as a
    * LOCAL relation — the zero-job leaf the driver-side flat trainer
    * returns: every downstream [[collectCellArrays]] of it is a direct
    * read (LocalTableScan collect launches no job), and a broadcast of it
    * builds straight from the local rows. Bounded by the same contract
    * as the collect that produced the arrays. */
  private def centArraysToDf(spark: SparkSession, ids: Array[Long],
      vecs: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    ids.zip(vecs).map { case (id, v) => (id, v) }.toSeq
      .toDF("cell_id", "c_emb")
  }

  /** The scan-side assignment shared by [[ivfAssign]] /
    * [[ivfAssignHierWith]] / the flat trainer: one [[collectCellArrays]]
    * job, then a single projection — no join, no exchange, no
    * per-candidate row blow-up. An empty centroid set keeps the old
    * crossJoin semantics (empty result). CONTRACT (r17 advisory): input
    * keys must be unique per row — the old crossJoin+max_by emitted one
    * row per DISTINCT key, this form one row per INPUT row; every caller
    * assigns tables keyed by a unique vec_id/cell_id, and a future
    * duplicate-key caller would change cardinality here. */
  private def assignScan(emb: DataFrame, cents: DataFrame,
      centIdCol: String, centEmbCol: String, embCol: String,
      outIdCol: String, outCols: Seq[String]): DataFrame = {
    val (ids, vecs) = collectCellArrays(cents, centIdCol, centEmbCol)
    assignScanArrays(emb, ids, vecs, embCol, outIdCol, outCols)
  }

  /** [[assignScan]] when the centroid arrays are ALREADY on the driver
    * (the flat trainer's frontier, [[hierIndex]]'s locally-trained coarse
    * level) — zero jobs, one projection. */
  private def assignScanArrays(emb: DataFrame, ids: Array[Long],
      vecs: Array[Array[Float]], embCol: String,
      outIdCol: String, outCols: Seq[String]): DataFrame = {
    val base =
      if (ids.isEmpty) emb.filter(lit(false))
        .withColumn(outIdCol, lit(null).cast("long"))
      else emb.withColumn(outIdCol,
        GraftFunctions.nearestCell(col(embCol), ids, vecs))
    base.select(outCols.map(col): _*)
  }

  /** IVF (inverted-file) coarse quantization: assign every vector to its
    * nearest centroid's cell. Real IVF trains centroids with k-means; here
    * the centroid set is a deterministic corpus subset (every 37th vector)
    * so the index is reproducible and oracle-checkable — the quantize/
    * probe/search plan shape is identical either way.
    *
    * Round 17: the argmax is evaluated SCAN-SIDE ([[assignScan]] — the
    * centroid set rides the plan as a codegen reference object, the same
    * collected bytes the previous `broadcast` shipped). The old spelling
    * — broadcast nested-loop to |corpus|·|centroids| rows, then a
    * `max_by` two-phase aggregate — shuffled one row PER CORPUS VECTOR,
    * embedding payload included, purely to re-group candidate rows the
    * scan had just fanned out; at 100 TB that is a full corpus shuffle
    * per assignment (guide §2.4 "remove shuffles outright"). Scores,
    * tie-breaks (cosine DESC, cell ASC) and NaN ordering are
    * bit-identical to the aggregate form ([[graft.functions.VectorKernels.nearestCell]]);
    * cost is the same |corpus|·|centroids| scan-side scores, now with no
    * exchange behind them. */
  def ivfAssign(emb: DataFrame, centroids: DataFrame): DataFrame =
    assignScan(emb, centroids, "cell_id", "c_emb", "embedding",
      "cell_id", Seq("vec_id", "cell_id", "embedding"))

  /** TWO-LEVEL (hierarchical) cell assignment — the O(N·√k) form of
    * [[ivfAssign]] for the k ∝ N regime (SemDedup-class sizing trains
    * k ≈ N/29 cells so cell SIZE stays constant; the flat argmax then
    * scores every vector against every centroid and the assignment term
    * is O(N²/29) — the structural super-linear row the round-13 sf1
    * full-registry run surfaced on `sim_kmeans_assign_steady` /
    * `dedup_semantic_text_steady`, BASELINE.md round-13 table).
    *
    * Construction (the classic coarse-quantizer trick, applied to the
    * assignment itself): TRAIN a coarse level over the k centroids —
    * Lloyd's on the centroid set itself, init every ⌈√k⌉-th centroid in
    * dense cell_id-rank order (k rows: the training is trivial and must
    * be trained, not subsampled — a blind 1-in-√k seed pick leaves
    * stage 1 with no signal for any vector whose centroid wasn't
    * picked, measured 0.50 agreement on clusterable data vs ~1.0
    * trained); group every centroid under its nearest coarse centroid
    * (k·√k scores, paid once per centroid set); then each vector scores
    * the √k coarse centroids, picks one group, and scores only that
    * group's ~√k members — 2·√k scores per vector instead of k. Total
    * O(N·√k) = O(N^1.5/√29) when k ∝ N, vs the flat form's O(N²/29).
    *
    * APPROXIMATE by design: a vector whose true nearest centroid was
    * grouped under a different coarse seed lands in a neighbouring cell
    * — the published IVF recall trade, acceptable for cell-scoped dedup
    * and labeling (the cross-cell near-pair was already invisible to
    * SemDedup). Exactness law: with `stride = Some(1)` every centroid
    * is its own coarse seed and the result ≡ [[ivfAssign]]
    * (SimilaritySpec pins it). Both argmaxes keep the (score DESC, id
    * ASC) tie-break so the assignment is deterministic and the oracle
    * replays every stage.
    *
    * Scale shape: the coarse side broadcast is ⌈√k⌉ rows (√N-class, the
    * same budget as the √N-cell ANN family); the per-group stage is an
    * EQUI-join on g_id against the k-row grouped centroid table with NO
    * forced strategy hint — k ∝ N in this operator's target regime, so
    * a forced broadcast would ship a corpus-proportional embedding
    * table (the decontaminateScrub lesson); AQE picks broadcast while
    * the table is small and degrades to a shuffled equi-join when it
    * isn't. The dense re-key ordering centroids is the range-bucketed
    * distributed rank ([[Relational.denseRankByKey]]) — the table is
    * k rows but k ∝ N, so no single task ever sorts it.
    *
    * COMPLETENESS: stage 1 argmaxes over only the coarse centroids
    * that own ≥1 member after the final regroup (`hierIndex`'s
    * semi-join) — the regroup re-derives memberships against the
    * re-centered coarse set, so a coarse centroid can end up empty, and
    * a vector routed to an empty group would vanish through the inner
    * member join. With the live-set filter every vector lands in a
    * non-empty group and gets a cell (spec-pinned). */
  def ivfAssignHier(emb: DataFrame, centroids: DataFrame,
      stride: Option[Long] = None): DataFrame = {
    val (coarseLive, grouped) = hierIndex(centroids, stride)
    ivfAssignHierWith(emb, coarseLive, grouped)
  }

  /** The per-CENTROID-SET half of [[ivfAssignHier]] — train the coarse
    * level, group every centroid under its nearest coarse centroid, and
    * drop emptied coarse centroids: returns (`coarseLive` — the ⌈√k⌉-row
    * (g_id, g_emb) stage-1 argmax set, restricted to groups with ≥1
    * member; `grouped` — the k-row (g_id, cell_id, c_emb) member table).
    * Split out so callers that assign SEVERAL vector sets against one
    * centroid set (the incremental gates: corpus + batch; the streaming
    * maintainers: every micro-batch) pay the O(k·√k) coarse training
    * ONCE — at production k a per-batch retrain would dominate small
    * batches. Both outputs are localCheckpoint'd (the kmeansCentroids
    * discipline) so multi-consumer plans read materialized leaves.
    * BYTE BOUND, stated honestly: "k-row" is NOT constant — under
    * SemDedup sizing k ≈ N/29, so `grouped` pins ≈ k·(dim·4 + ~16) B of
    * embedding rows to executor local disk (64-lane floats ≈ 272 B/row
    * → ~9 GB per 10⁹ corpus vectors, spread across executors) and
    * `coarseLive` ⌈√k⌉·dim·4 B. The centroid table inherently EXISTS at
    * that size — the checkpoint adds one materialized copy, not a new
    * asymptote — and the production spelling is the LANDED form
    * ([[ensureHierIndex]]), where both tables live as parquet and no
    * call pins local disk. */
  def hierIndex(centroids: DataFrame,
      stride: Option[Long] = None): (DataFrame, DataFrame) = {
    val k = centroids.count() // bounded: |centroids| rows
    val s = stride.getOrElse(
      math.max(1L, math.ceil(math.sqrt(k.toDouble)).toLong))
    // stride 1: the coarse level IS the centroid set (the degeneracy
    // law SimilaritySpec pins); otherwise train it — Lloyd's over the
    // k centroid rows under DENSE rank ids, so the init stride always
    // seeds (raw cell_ids are sparse and a blind modulus can miss).
    // The dense rank is the DISTRIBUTED range-bucketed device
    // ([[Relational.denseRankByKey]] — bit-identical to
    // `row_number() OVER (ORDER BY cell_id) − 1`, which the oracle still
    // spells), NOT a global window: k ∝ N in this operator's target
    // regime (SemDedup sizing, k ≈ N/29), and an unpartitioned window
    // would sort a corpus-proportional embedding table through ONE task
    // — the same unbounded-single-task class the E75 shuffle device
    // exists to avoid.
    if (s <= 1) {
      val coarse =
        centroids.select(col("cell_id").as("g_id"), col("c_emb").as("g_emb"))
      // regroup via the scan-side argmax (r17): same scores and (gs DESC,
      // g_id ASC) tie-break as the old crossJoin + max_by aggregate, with
      // the k-row exchange it paid removed — see ivfAssign's scaladoc
      val grouped = assignScan(centroids, coarse, "g_id", "g_emb", "c_emb",
          "g_id", Seq("cell_id", "g_id", "c_emb"))
        .localCheckpoint()
      // completeness (see ivfAssignHier's scaladoc): a coarse centroid
      // the regroup emptied must not be a stage-1 target
      val coarseLive = coarse
        .join(grouped.select("g_id").distinct(), Seq("g_id"), "left_semi")
        .localCheckpoint()
      (coarseLive, grouped)
    } else {
      // the coarse training is the driver-frontier flat recurrence (r18):
      // its ⌈√k⌉-row result comes back as arrays — same values as the
      // distributed spelling (bit-identical recenter arithmetic), with
      // the per-iteration frontier checkpoint jobs gone — so the regroup
      // assigns scan-side with zero collect jobs and coarseLive is a
      // LOCAL relation (stage-1 argmax consumers collect it for free)
      val coarseDf = kmeansCentroids(
        Relational.denseRankByKey(centroids, "cell_id", "vec_id")
          .select(col("vec_id"), col("c_emb").as("embedding")),
        initEvery = s.toInt)
      val (gids, gvecs) = collectCellArrays(coarseDf, "cell_id", "c_emb")
      val grouped = assignScanArrays(centroids, gids, gvecs, "c_emb",
          "g_id", Seq("cell_id", "g_id", "c_emb"))
        .localCheckpoint()
      // completeness: same live-group cut as the semi-join it replaces —
      // the distinct g_id set is ⌈√k⌉-bounded, the same collect class as
      // the coarse set itself
      val live = grouped.select("g_id").distinct()
        .collect().map(_.getLong(0)).toSet
      val keep = gids.indices.filter(i => live(gids(i)))
      val coarseLive = centArraysToDf(centroids.sparkSession,
          keep.map(gids(_)).toArray, keep.map(gvecs(_)).toArray)
        .select(col("cell_id").as("g_id"), col("c_emb").as("g_emb"))
      (coarseLive, grouped)
    }
  }

  /** Land-or-load the two-level assignment index for a LANDED centroid
    * family: `<prefix>_hlive` (the ⌈√k⌉-row live coarse set) +
    * `<prefix>_hgrouped` (the k-row member table), both pure
    * deterministic functions of the centroid set — so landing changes
    * no answer (the landed ≡ trained law) and the STEADY serves read
    * two small tables instead of re-running the O(k·√k) coarse
    * training per call (at sf0.1 that training is ~6 job floors per
    * serve — the crossover's whole left side; at production k it is
    * real work). First call on a fresh catalog trains + lands; every
    * later call reads. */
  def ensureHierIndex(spark: SparkSession, prefix: String,
      centroids: => DataFrame): (DataFrame, DataFrame) = {
    graft.sources.Landing.ensureLanded(spark, s"${prefix}_hidx",
      Seq(s"${prefix}_hlive", s"${prefix}_hgrouped")) { path =>
      val (cl, g) = hierIndex(centroids)
      cl.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .option("path", s"$path/hlive").saveAsTable(s"${prefix}_hlive")
      g.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .option("path", s"$path/hgrouped").saveAsTable(s"${prefix}_hgrouped")
    }
    (spark.table(s"${prefix}_hlive"), spark.table(s"${prefix}_hgrouped"))
  }

  /** The landed hier index of the corpus dir's trained quantizers —
    * the pair every per-dir steady serve assigns with. */
  def loadLandedHierIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    ensureHierIndex(spark, quantizerPrefix(dir),
      loadLandedQuantizers(spark, dir)._1)

  /** The per-VECTOR-SET half of [[ivfAssignHier]]: the two-stage argmax
    * of `emb` against a prebuilt [[hierIndex]] pair. */
  def ivfAssignHierWith(emb: DataFrame, coarseLive: DataFrame,
      grouped: DataFrame): DataFrame = {
    // stage 1 via the scan-side argmax (r17): the ⌈√k⌉ coarse set is the
    // bounded side, so the group pick needs no exchange at all — the old
    // crossJoin + max_by shuffled one embedding-carrying row per vector
    // before the member join (see ivfAssign's scaladoc)
    val v1 = assignScan(emb, coarseLive, "g_id", "g_emb", "embedding",
      "g_id", Seq("vec_id", "g_id", "embedding"))
    // stage 2 (r18): fold each coarse group's ~√k member centroids into
    // ONE array row (a ⌈√k⌉-row regroup of the k-row member table), join
    // every vector to its single group row, and evaluate the member
    // argmax SCAN-SIDE ([[graft.functions.NearestCellIn]] — same cosine
    // loop, same (cs DESC, cell ASC) total order, same null ordering as
    // the max_by it replaces, order-independent so collect_list order
    // cannot show through). The old spelling fanned every vector out to
    // its ~√k member candidates and re-grouped them with a struct-ordered
    // max_by — a SortAggregate pair around an Exchange carrying one
    // embedding-payload row PER CORPUS VECTOR per assignment (guide §2.4:
    // at 100 TB, a full corpus shuffle). Now the only corpus-side
    // operator after the join is a projection; the join itself is the
    // same no-hint g_id equi-join (AQE broadcasts the member side while
    // it is small, degrades to a shuffled join when k ∝ N says it must).
    val gm = grouped.groupBy("g_id")
      .agg(collect_list(struct(col("cell_id"), col("c_emb"))).as("members"))
    v1.join(gm, Seq("g_id"))
      .select(col("vec_id"),
        GraftFunctions.nearestCellIn(col("embedding"), col("members"))
          .as("cell_id"),
        col("embedding"))
  }

  /** CORRECTNESS/bench instantiation of [[ivfAssignHier]]: two-level
    * assignment of the embeddings corpus under the LANDED trained
    * centroids AND the LANDED hier index ([[loadLandedHierIndex]] —
    * both trainings amortized to the land; the timed plan is the
    * production labeling pass at the O(N·√k) cost, no Lloyd's
    * anywhere). Landed ≡ trained (deterministic trainers), so the
    * oracle replays the kmeans CTE block, the coarse training, and the
    * same two argmax stages. */
  def kmeansAssignmentsHier(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (coarseLive, grouped) = loadLandedHierIndex(spark, dir)
    ivfAssignHierWith(emb, coarseLive, grouped)
      .select("vec_id", "cell_id")
  }

  /** Deterministic stand-in for trained centroids: every 37th vector. */
  def defaultCentroids(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 37 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))

  /** Lloyd's k-means over the corpus — the TRAINED-centroid path real IVF
    * uses (vs [[defaultCentroids]]' fixed subset). Deterministic end to
    * end: seeded init (every `initEvery`-th vector), cosine assignment
    * with the same (score DESC, cell ASC) tie-break as [[ivfAssign]], and
    * per-lane means rounded to 6 dp before the float cast — so different
    * partial-aggregation orders (and the DuckDB oracle's sequential sums,
    * which differ at ~1e-13) collapse to identical centroids.
    *
    * Scale shape per iteration: assignment is the same bounded
    * corpus×constant broadcast cross as [[ivfAssign]] + a `max_by`
    * two-phase argmax (one row per vector crosses); the re-centering is a
    * row-local posexplode of lanes + a two-phase avg on (cell, lane) —
    * k·dim rows cross the shuffle, never vectors. The k-row centroid
    * frontier is localCheckpoint'd so the plan stays one-iteration-deep.
    * Cells that lose all members drop out (standard Lloyd degeneracy;
    * callers needing fixed k re-seed — at corpus scale with k ≪ n this
    * does not occur).
    *
    * SIZING CONTRACT (round 15): this exact flat form is for BOUNDED-k
    * sizing only — the √N family ([[scaledInitEvery]]), [[hierIndex]]'s
    * internal ⌈√k⌉-seed coarse level, and the streaming √N maintainer —
    * where the per-iteration `broadcast(cent)` side is bounded by
    * construction. Under k ∝ N sizing (the initEvery=29 SemDedup
    * default) the broadcast ships a corpus-proportional embedding table
    * and the cross is O(N²/29): every such call site trains with
    * [[kmeansCentroidsHier]] instead; the default stride survives here
    * for the `sim_kmeans` entry, which pins this recurrence against its
    * oracle. */
  def kmeansCentroids(emb: DataFrame, initEvery: Int = 29, iters: Int = 3): DataFrame =
    kmeansIterFlat(emb, seedInit(emb, initEvery), iters)

  /** The shared seeded init: every `initEvery`-th vector as a centroid. */
  private def seedInit(emb: DataFrame, initEvery: Int): DataFrame =
    emb.filter(col("vec_id") % initEvery === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"))

  private def kmeansIterFlat(emb: DataFrame, init: DataFrame,
      iters: Int): DataFrame = {
    val (ids, vecs) = collectCellArrays(init, "cell_id", "c_emb")
    val (oids, ovecs) = kmeansIterFlatArrays(emb, ids, vecs, iters)
    centArraysToDf(emb.sparkSession, oids, ovecs)
  }

  /** The flat Lloyd's recurrence with the k-row frontier held ON THE
    * DRIVER between iterations (r18; bounded by the same sizing contract
    * as the scan-side argmax it feeds — ≤ [[FlatTrainerMaxSeeds]] rows
    * at every dispatched call site). Each iteration is ONE job: the
    * corpus scan assigns scan-side ([[assignScanArrays]] — frontier rides
    * as codegen literals) and the per-(cell, lane) means come back as a
    * k·dim-row collect (the same bounded byte budget the old frontier
    * localCheckpoint + next-iteration collect moved TWICE through block
    * storage — r17 paid 2 jobs per iteration plus a final re-collect in
    * the first consumer). Arithmetic is bit-identical to [[recenter]]:
    * the 6-dp round happens in the aggregate, the float cast on the
    * driver is the same double→float narrowing. */
  private def kmeansIterFlatArrays(emb: DataFrame, init: Array[Long],
      initVecs: Array[Array[Float]], iters: Int): (Array[Long], Array[Array[Float]]) = {
    var ids = init
    var vecs = initVecs
    for (_ <- 1 to iters) {
      if (ids.nonEmpty) {
        val laneMeans = assignScanArrays(emb, ids, vecs, "embedding",
            "cell_id", Seq("cell_id", "embedding"))
          .select(col("cell_id"), posexplode(col("embedding")))
          .toDF("cell_id", "lane", "v")
          .groupBy("cell_id", "lane")
          .agg(round(avg(col("v").cast("double")), 6).as("m"))
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        val byCell = laneMeans.groupBy(_._1).toArray.sortBy(_._1)
        ids = byCell.map(_._1)
        vecs = byCell.map(_._2.sortBy(_._2).map(_._3.toFloat))
      }
    }
    (ids, vecs)
  }

  /** Lloyd's re-centering step, shared by both trainers: per-(cell, lane)
    * means over the assigned rows (row-local posexplode + a two-phase
    * avg — k·dim rows cross the shuffle, never vectors), 6-dp rounded
    * before the float cast so partial-aggregation orders and the
    * oracle's sequential sums collapse to identical centroids. The k-row
    * frontier is localCheckpoint'd so the plan stays one-iteration-deep. */
  private def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell_id"), posexplode(col("embedding")))
      .toDF("cell_id", "lane", "v")
      .groupBy("cell_id", "lane")
      .agg(round(avg(col("v").cast("double")), 6).as("m"))
      .groupBy("cell_id")
      .agg(transform(array_sort(collect_list(struct(col("lane"), col("m")))),
        x => x.getField("m").cast("float")).as("c_emb"))
      .localCheckpoint()

  /** Lloyd's k-means with the TWO-LEVEL argmax inside the training loop
    * — the trainer that stays runnable when k ∝ N (SemDedup sizing,
    * k ≈ N/29). [[kmeansCentroids]]' per-iteration assignment is an N×k
    * broadcast cross: at that sizing the broadcast side is a
    * corpus-proportional embedding table (OOM before the compute
    * starts) and the compute is O(iters·N²/29). Here each iteration
    * instead (1) trains a ⌈√k⌉-seed coarse level over the CURRENT
    * centroid frontier ([[hierIndex]] — O(k·√k), the round-14 device),
    * and (2) assigns the corpus through the two-stage argmax
    * ([[ivfAssignHierWith]] — O(N·√k) + a per-group equi-join), then
    * re-centers exactly like the flat trainer. Per-iteration cost drops
    * from N·k to ≈ (N + k)·√k; no forced broadcast of any k∝N side
    * anywhere in the loop.
    *
    * APPROXIMATE exactly like serve-time two-level assignment — a vector
    * whose true nearest centroid was grouped under a different coarse
    * seed re-centers a neighbouring cell instead (the published
    * hierarchical/coarse-pruned k-means trade; the trainer is still a
    * strict descent on the pruned objective). Deterministic end to end:
    * the same seeded init, the same (score DESC, id ASC) tie-breaks in
    * BOTH argmax stages and inside the coarse training, the same 6-dp
    * re-center rounding — so the DuckDB oracle replays the full pruned
    * recurrence stage for stage. The FLAT trainer remains the correct
    * choice (and the spelling in use) for bounded-k sizing: the IVF √N
    * family, [[hierIndex]]'s own ⌈√k⌉-seed coarse level, and the
    * streaming √N maintainer — there the broadcast side is √N-class by
    * construction. */
  def kmeansCentroidsHier(emb: DataFrame, initEvery: Int = 29,
      iters: Int = 3): DataFrame =
    // k-row frontier checkpointed: hierIndex counts + scans it 4×
    kmeansIterHier(emb, seedInit(emb, initEvery).localCheckpoint(), iters)

  private def kmeansIterHier(emb: DataFrame, init: DataFrame,
      iters: Int): DataFrame = {
    var cent = init
    for (_ <- 1 to iters) {
      val (coarseLive, grouped) = hierIndex(cent)
      cent = recenter(ivfAssignHierWith(emb, coarseLive, grouped))
    }
    cent
  }

  /** Dispatch boundary between the exact flat trainer and the two-level
    * pruned trainer. Round 16 re-bracketed the crossover with same-window
    * flat/hier pairs on BOTH trainer corpora (each point is trainer-only
    * wall-clock, two interleaved passes per point):
    * d=64 planted vectors — k=724: flat 7.6–9.8 s vs hier 8.3–11.4 s
    * (flat narrowly); k=1 086: 8.9–12.7 vs 8.7–10.9 (parity); k=1 448:
    * 13.9–18.7 vs 10.5–14.5 (hier); k=2 172: 27.2–32.6 vs 13.9–19.6
    * (hier ~2×); d=8 hashed text vectors — k=1 724: 23.6–26.6 vs
    * 12.2–13.8 (hier 2×). The round-15 pin (4 096, from a one-window
    * "flat 5.06 s at k≈2 070" read) did NOT reproduce under the
    * interleaved brackets — that read was window luck, and it cost the
    * sf1 text entry a 31 s flat train where hier does it in ~12. The
    * crossover sits at ≈1 000 seeds on both corpora, so round 16 pinned
    * 1 024: below it flat's win was ≤ ~1.1×; above it hier's win grew
    * with k (17.5× by k ≈ 20.7 k — the r15 sf10 asymptote, unchanged).
    *
    * Round 18 RE-BRACKETED after the driver-frontier flat recurrence and
    * the scan-side assignment cheapened flat iterations (the r17 verdict
    * ask): same interleaved flat/hier pairs, two passes per point —
    * d=64 planted vectors: k=724 flat 1.8–3.2 vs hier 5.4–7.3 (flat
    * 2–3×); k=1 448: 3.1–5.0 vs 6.1–10.0 (flat ~2×); k=2 172: 4.2–6.0
    * vs 10.7–13.1 (flat ~2.4×); k=4 344: 10.8–13.7 vs 9.5–13.1
    * (PARITY); k=8 689: 36.6–40.5 vs 12.9–16.8 (hier 2.4–2.8×);
    * d=8 hashed text: k=1 724 flat 1.6–5.0 vs hier 12.0–13.8; k=3 448:
    * 2.2–3.7 vs 4.7–9.1; k=5 173: 2.9–4.3 vs 6.2–8.3 (all flat ~2×+ —
    * the d=8 crossover sits higher because flat's per-seed row cost is
    * 8× smaller). The d=64 parity point bounds the shared pin: 4 096.
    * Below it flat wins ≥2× on both corpora; above it the d=64 corpus
    * inverts by k≈8.7 k (text in (4 096, ~5 k] pays hier's ~2× as the
    * price of one shared constant protecting the d=64 worst case). The
    * driver-side frontier this implies is ≤ 4 096·dim floats — ~1 MB at
    * d=64, the same bounded-collect class as before. */
  val FlatTrainerMaxSeeds: Long = 4096L

  /** Size-dispatched Lloyd's — the trainer every k∝N (SemDedup-sized)
    * call site uses. The seed count k = |{vec_id % initEvery = 0}| is a
    * deterministic function of the corpus, so the dispatch predicate is
    * replayable: the DuckDB oracle computes the SAME count and selects
    * the matching recurrence, keeping every adopting entry hash-green
    * at any scale factor. At or below [[FlatTrainerMaxSeeds]] seeds the
    * EXACT flat recurrence ([[kmeansCentroids]]) is both cheaper (no
    * per-iteration coarse training — ~25 job floors at sf0.1) and
    * exact; above it the two-level pruned recurrence
    * ([[kmeansCentroidsHier]]) is the only one that stays runnable
    * (flat is O(iters·N·k) with a k∝N broadcast side). The count is
    * folded into the init job both trainers already pay: the seed frame
    * is materialized ONCE (eager localCheckpoint — the single corpus
    * scan), the count reads the cached k-row frame (a job floor, not a
    * scan — the round-16 nit), and the chosen recurrence iterates from
    * that same frame. `flatMaxSeeds` is parameterized only so the
    * dispatch-boundary law is spec-testable; production callers take
    * the pinned default. */
  def kmeansCentroidsAuto(emb: DataFrame, initEvery: Int = 29,
      iters: Int = 3, flatMaxSeeds: Long = FlatTrainerMaxSeeds): DataFrame = {
    val init = seedInit(emb, initEvery).localCheckpoint()
    // dispatch + flat-path seed fetch in ONE bounded read (r18): a
    // limit(flatMaxSeeds + 1) collect answers "seeds ≤ flatMaxSeeds?"
    // exactly like the r16 count job did (same pinned frame, same
    // count), and when the answer is yes the collected rows ARE the full
    // seed set — the flat recurrence starts from driver arrays with no
    // further collect. When the answer is no, at most flatMaxSeeds + 1
    // rows were pulled (the bounded-collect class), and the hier
    // recurrence proceeds distributed as before.
    val lim = math.min(flatMaxSeeds + 1L, Int.MaxValue.toLong).toInt
    val head = init.select(col("cell_id").cast("long"), col("c_emb"))
      .limit(lim).collect()
    if (head.length <= flatMaxSeeds) {
      val rows = head.filter(_.get(1) != null)
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
      val (oids, ovecs) =
        kmeansIterFlatArrays(emb, rows.map(_._1), rows.map(_._2), iters)
      centArraysToDf(emb.sparkSession, oids, ovecs)
    } else kmeansIterHier(emb, init, iters)
  }

  def topKCosineIvf(spark: SparkSession, dir: String, k: Int = 5, nprobe: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    topKCosineIvf(emb, defaultQueries(emb), k, nprobe)
  }

  /** IVF search: probe the `nprobe` cells nearest each query, score only
    * vectors assigned to probed cells, keep k best. At 100 TB the win is
    * that the scored candidate set is (nprobe/|cells|) of the corpus per
    * query instead of all of it; the probe table is tiny (|Q|·nprobe) and
    * broadcasts into the cell equi-join. Missing a neighbor whose cell
    * wasn't probed is the documented approximation — recall rises with
    * nprobe, hitting exact search at nprobe = |cells|. */
  def topKCosineIvf(emb: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val centroids = defaultCentroids(emb)
    val assigned = ivfAssign(emb, centroids)
    val wProbe = Window.partitionBy("query_id").orderBy(col("cs").desc, col("cell_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("c_emb")).as("cs"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select("query_id", "q_emb", "cell_id")
    val scored = assigned.join(broadcast(probes), "cell_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
    topKCut(scored, k)
  }

  /** Approximate top-k: bucket corpus and queries by hyperplane bands,
    * score only same-bucket pairs, keep k best per query. The join is a
    * bucket equi-join on (band, bucket) — candidate count ∝ collisions,
    * not |Q|·N. Recall vs [[topKCosine]] is property-tested in
    * SimilaritySpec; missing a neighbor that collides in no band is the
    * documented approximation. */
  def topKCosineLsh(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    topKCosineLsh(emb, col("vec_id").isin(defaultProbeIds: _*), k)
  }

  /** Product-quantization codebook: `m` subspaces × `kc` centroids of
    * `subDim` lanes each, deterministic from a splitmix64 seed (plan
    * literals, like [[planeVectors]] — public so the oracle embeds the
    * SAME values). A production index trains these per-subspace with
    * [[kmeansCentroids]] over vector slices; the seeded codebook keeps
    * the whole encode/score plan oracle-checkable, and the plan shape is
    * identical either way. */
  def pqCodebook(m: Int = 8, kc: Int = 16, subDim: Int = 8,
      seed: Long = 0xC0DEB00CL): Seq[(Int, Int, Array[Double])] =
    for (s <- 0 until m; c <- 0 until kc) yield (s, c, Array.tabulate(subDim) { l =>
      val h = graft.functions.HashKernels.splitmix64(
        seed ^ (s * 1000003L + c * 1009L + l))
      (h >>> 11) * (2.0 / (1L << 53)) - 1.0
    })

  /** The literal-dot building block: e·c with `c` a plan literal,
    * evaluated as a left-fold so the summation order is the same
    * sequential order the DuckDB oracle's `list_inner_product` uses. */
  private def litDot(e: org.apache.spark.sql.Column, c: Array[Double]) =
    aggregate(zip_with(e, typedlit(c.toSeq), (x, cc) => x * cc),
      lit(0.0d), (acc, t) => acc + t)

  /** PQ encode, entirely SCAN-SIDE: per subspace, the code is the argmin
    * over the book's literal centroids of ‖e_s − c‖² — computed as the
    * monotone-equivalent ‖c‖² − 2·e_s·c (the ‖e_s‖² term is common to
    * the argmin) and picked with `array_min` over (dist, cell) structs,
    * so the tie-break (smaller cell) is part of the expression. A 100 TB
    * corpus encodes in one pass with NO shuffle, emitting m small ints
    * (the m·log₂kc-bit code) per vector — the 32× compression that lets
    * the index live in memory. `book` defaults to the seeded
    * [[pqCodebook]]; pass [[pqCodebookTrained]]'s output for the trained
    * index (cells Lloyd's dropped are simply absent from the argmin). */
  def pqEncode(emb: DataFrame, m: Int = 8, kc: Int = 16, subDim: Int = 8): DataFrame =
    pqEncodeWithBook(emb, m, subDim, pqCodebook(m, kc, subDim))

  /** The per-sub (cell-id, centroid) arrays of a codebook, cell-sorted —
    * the reference-object payload of the kernel encode below. */
  private def bookArrays(m: Int,
      book: Seq[(Int, Int, Array[Double])]): (Array[Array[Long]], Array[Array[Array[Double]]]) = {
    val bySub = book.groupBy(_._1)
    val ids = Array.tabulate(m)(s =>
      bySub.getOrElse(s, Seq.empty).map(_._2.toLong).sorted.toArray)
    val cents = Array.tabulate(m)(s =>
      bySub.getOrElse(s, Seq.empty).sortBy(_._2).map(_._3).toArray)
    (ids, cents)
  }

  def pqEncodeWithBook(emb: DataFrame, m: Int, subDim: Int,
      book: Seq[(Int, Int, Array[Double])]): DataFrame = {
    // r18: the per-sub argmin is ONE kernel call with the codebook as a
    // codegen reference object ([[graft.functions.PqEncodeCodes]] — same
    // fold order, ‖c‖² precomputed by the same Scala sum, same
    // (d ASC, cell ASC) order and null degeneracy as the literal tree).
    // The r9–r17 spelling planned m·kc candidate structs each wrapping a
    // zip_with-fold dot — a ~10⁵-char expression tree that every
    // materialization of every PQ entry re-planned and re-codegen'd
    // (guide §4: the job shape was right, the per-task code was not).
    val (ids, cents) = bookArrays(m, book)
    val codes = GraftFunctions.pqCodes(col("embedding"), subDim, ids, cents)
    emb.select(col("vec_id") +: (0 until m).map(s =>
      element_at(codes, s + 1).as(s"code_$s")): _*)
  }

  /** Train the PQ codebook with per-subspace Lloyd's — the
    * [[kmeansCentroids]] recipe specialized to the ADC metric: assignment
    * is the argmin of ‖c‖² − 2·e_s·c (exactly what [[pqEncode]] will
    * evaluate, tie on smaller cell), re-centering rounds each lane mean
    * to 6 dp (the same cross-engine drift absorber as `sim_kmeans`), and
    * init is deterministic (cell c of every subspace starts at vector
    * `c·initStep`'s subvector). All m subspaces train in ONE job per
    * iteration: the corpus explodes row-locally to (vec_id, sub,
    * subvector), assignment is scan-side against the current book as
    * plan literals, and only the (sub, cell, lane, mean) table — m·kc·
    * subDim rows — crosses the shuffle and lands on the driver (the same
    * bounded-collect legitimacy class as the centroid literals). Cells
    * that lose all members drop out (standard Lloyd degeneracy). */
  def pqCodebookTrained(emb: DataFrame, m: Int = 8, kc: Int = 16,
      subDim: Int = 8, initStep: Int = 31, iters: Int = 2): Seq[(Int, Int, Array[Double])] = {
    val subCols = array((0 until m).map(s =>
      slice(col("embedding"), s * subDim + 1, subDim)): _*)
    // every Lloyd iteration folds the full subvector table; persist it so
    // the corpus is scanned and exploded once, not once per iteration
    // (row count = corpus × m, payload = the same floats as the source —
    // the standard iterative-trainer cache, MEMORY_AND_DISK so an
    // over-memory corpus spills instead of re-scanning)
    val subs = emb.select(col("vec_id"), posexplode(subCols))
      .toDF("vec_id", "sub", "sv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var book: Map[(Int, Int), Array[Double]] =
      emb.filter(col("vec_id").isin((0 until kc).map(_.toLong * initStep): _*))
        .select(col("vec_id"), posexplode(subCols))
        .toDF("vec_id", "sub", "sv")
        .collect().map { r =>
          // element-type-tolerant: the corpus embeds as float, the
          // residual table ([[residuals]]) as double — both train here
          ((r.getInt(1), (r.getLong(0) / initStep).toInt) ->
            r.getSeq[Number](2).map(_.doubleValue).toArray)
        }.toMap
    for (_ <- 1 to iters) {
      // r18: the per-row assignment is the same kernel argmin as the
      // encode ([[graft.functions.PqAssignCell]] — book as a reference
      // object), replacing the per-iteration m·kc literal candidate tree
      // the trainer re-planned and re-codegen'd every Lloyd step
      val (bids, bcents) = bookArrays(m,
        book.toSeq.map { case ((s, c), arr) => (s, c, arr) })
      val cell = GraftFunctions.pqCell(col("sub"), col("sv"), bids, bcents)
        .cast("int")
      book = subs.withColumn("cell", cell)
        .select(col("sub"), col("cell"), posexplode(col("sv")))
        .toDF("sub", "cell", "lane", "v")
        .groupBy("sub", "cell", "lane")
        .agg(round(avg(col("v").cast("double")), 6).as("mv"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
    }
    subs.unpersist()
    book.toSeq.map { case ((s, c), arr) => (s, c, arr) }.sortBy(t => (t._1, t._2))
  }

  def topKPq(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    topKPq(emb, defaultQueries(emb), k, m = 8, kc = 16, subDim = 8)
  }

  /** The TRAINED-codebook PQ/ADC entry: [[pqCodebookTrained]] over the
    * corpus, then the identical encode/LUT/score plan as [[topKPq]]. */
  def topKPqTrained(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    topKPqWithBook(emb, defaultQueries(emb), k, m = 8, subDim = 8,
      pqCodebookTrained(emb))
  }

  /** STEADY-STATE form of [[topKPqTrained]] — the production serve path
    * the rebuild entry cannot time: the codebook is trained ONCE per
    * corpus dir (a bounded driver-side literal table, exactly what a
    * deployment persists alongside the index) and every subsequent call
    * scores with the SAVED book through [[topKPqWithBook]], so the timed
    * plan is encode + broadcast-LUT + partial-merge ADC only — no Lloyd's
    * iterations. Same answer, same oracle as `sim_topk_pq_trained`; the
    * first call (Bench's unmeasured warm-up, Verify's only pass) pays the
    * training. */
  private val trainedBooks =
    collection.concurrent.TrieMap[String, Seq[(Int, Int, Array[Double])]]()
  def topKPqSteady(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val book = trainedBooks.getOrElseUpdate(dir, pqCodebookTrained(emb))
    topKPqWithBook(emb, defaultQueries(emb), k, m = 8, subDim = 8, book)
  }

  /** PQ/ADC search (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011 — public): approximate inner product
    * score(q, v) = Σ_s q_s · c_{s, code_s(v)} — the corpus side is only
    * its m-byte codes; per query the m×kc look-up table of subspace dots
    * is tiny and broadcasts. Scale shape: encode is scan-side
    * ([[pqEncode]]); scoring explodes each vector's m codes row-locally,
    * joins the broadcast LUT, and partial-merge-sums to one score per
    * (query, vector) — the per-pair cost is m LUT adds instead of dim
    * multiplies, which is the whole point of ADC at 100 TB. Scores are
    * rounded to 6 dp BEFORE the k-cut (an 8-term double sum's order
    * differs across engines; the rounding makes the ranking cross-engine
    * exact), ties broken by vec_id inside `topk_by`. */
  def topKPq(emb: DataFrame, queries: DataFrame, k: Int,
      m: Int, kc: Int, subDim: Int): DataFrame =
    topKPqWithBook(emb, queries, k, m, subDim, pqCodebook(m, kc, subDim))

  /** Per-query ADC look-up table: the subspace dots of `queries` against
    * every book centroid as one nested-array literal expression of
    * (cell, w) structs (cell carried explicitly so a trained book with
    * dropped cells stays addressable), exploded row-locally to
    * (query_id, sub, cell, w) — |Q|·m·kc tiny rows, always broadcast by
    * callers. Shared by [[topKPqWithBook]] and [[topKPqIvfWith]]. */
  private def pqLutRows(queries: DataFrame, m: Int, subDim: Int,
      b: Seq[(Int, Int, Array[Double])]): DataFrame = {
    val bySub = b.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(r => (r._2, r._3)).sortBy(_._1)
    }
    val perSub = array((0 until m).map { s =>
      val sub = slice(col("q_emb"), s * subDim + 1, subDim)
      array(bySub(s).map { case (c, cv) =>
        struct(lit(c.toLong).as("cell"), litDot(sub, cv).as("w"))
      }: _*)
    }: _*)
    queries.select(col("query_id"), posexplode(perSub))
      .toDF("query_id", "sub", "ws")
      .select(col("query_id"), col("sub"), explode(col("ws")).as("cw"))
      .select(col("query_id"), col("sub"),
        col("cw.cell").as("cell"), col("cw.w").as("w"))
  }

  def topKPqWithBook(emb: DataFrame, queries: DataFrame, k: Int,
      m: Int, subDim: Int, b: Seq[(Int, Int, Array[Double])]): DataFrame = {
    val codes = pqEncodeWithBook(emb, m, subDim, b)
      .select(col("vec_id"), posexplode(
        array((0 until m).map(s => col(s"code_$s")): _*)))
      .toDF("vec_id", "sub", "cell")
    val scored = codes.join(broadcast(pqLutRows(queries, m, subDim, b)), Seq("sub", "cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(round(sum(col("w")), 6).as("score"))
    topKCut(scored, k)
  }

  /** IVF-PQ search — the two quantizers composed the way production ANN
    * systems ship them (Jégou et al., TPAMI 2011; the FAISS IVFPQ layout —
    * public): the coarse IVF quantizer prunes the corpus to the `nprobe`
    * cells nearest each query, and PQ/ADC scores ONLY the surviving
    * candidates on their m-byte codes. The index side is built the way it
    * would be LANDED at 100 TB: each vector's m code rows carry its
    * coarse cell — the inverted-list layout — so query time touches the
    * corpus embeddings never (scan-side encode happened at build), reads
    * only (nprobe/|cells|) of the code table via the broadcast probe
    * equi-join, and pays m LUT adds per candidate. Per-query LUT is
    * |Q|·m·kc tiny rows, broadcast; the only data-scale exchange is the
    * (query_id, vec_id, partial-sum) 24-byte aggregation. Scores are
    * 6-dp rounded before the k-cut (the shared ADC drift rule); recall
    * rises with nprobe exactly as in [[topKCosineIvf]]. */
  def topKPqIvf(emb: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      m: Int, kc: Int, subDim: Int): DataFrame =
    topKPqIvfWith(emb, queries, k, nprobe, m, subDim,
      defaultCentroids(emb), pqCodebook(m, kc, subDim))

  /** [[topKPqIvf]] with caller-supplied quantizers — the seam the TRAINED
    * instantiation ([[topKPqIvfTrained]]: k-means cells + Lloyd's
    * codebook) shares with the seeded one; the plan is identical either
    * way, only the literals change. */
  def topKPqIvfWith(emb: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
      m: Int, subDim: Int, centroids: DataFrame,
      b: Seq[(Int, Int, Array[Double])]): DataFrame =
    searchIvfPqIndex(ivfPqIndexRows(emb, m, subDim, centroids, b),
      queries, k, nprobe, m, subDim, centroids, b)

  /** The inverted-list index rows a production IVF-PQ system LANDS: one
    * (vec_id, cell_id, sub, code) row per vector per subspace — coarse
    * assignment + scan-side PQ encode, joined on vec_id. This is the
    * "index build paid once" half of [[topKPqIvfWith]], split out so the
    * streaming maintainer ([[graft.streaming.StreamIvfPq]]) can append
    * per-batch generations of exactly these rows. */
  def ivfPqIndexRows(emb: DataFrame, m: Int, subDim: Int,
      centroids: DataFrame, b: Seq[(Int, Int, Array[Double])]): DataFrame = {
    val cells = ivfAssign(emb, centroids).select("vec_id", "cell_id")
    pqEncodeWithBook(emb, m, subDim, b)
      .select(col("vec_id"), posexplode(
        array((0 until m).map(s => col(s"code_$s")): _*)))
      .toDF("vec_id", "sub", "code")
      .join(cells, "vec_id")
  }

  /** The probed (query_id, cell_id) assignment, COLLECTED to the driver —
    * |Q|·nprobe pairs, the same bounded-collect legitimacy class as the
    * centroid/codebook literals (the query set is small by contract).
    * Collecting it is what lets [[searchIvfPqIndex]] prune the code-table
    * SCAN with a literal `cell_id IN (…)` (partition/bucket pruning on a
    * landed layout) instead of discarding non-probed cells only at the
    * join, which still reads the whole table. Deterministic: ties break
    * on (cosine DESC, cell ASC), and the result is sorted. */
  def collectProbes(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): Seq[(Long, Long)] = {
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cs").desc, col("cell_id").asc)
    queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cell_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("c_emb")).as("cs"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").cast("long"), col("cell_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  /** The serve half of [[topKPqIvfWith]]: prune + ADC-score a prebuilt
    * inverted-list `index` ([[ivfPqIndexRows]] rows — in-memory, a landed
    * bucketed table ([[ensureIvfPqCodes]]), or the streaming maintainer's
    * cell-partitioned generations). The probe assignment is COLLECTED
    * ([[collectProbes]]) so the candidate prune is a literal
    * `cell_id IN (probed cells)` AT THE SCAN — on a cell-bucketed or
    * cell-partitioned layout Spark prunes buckets/partitions and the
    * query physically reads only (nprobe/|cells|) of the code table, the
    * inverted-list read IVF exists for (IvfPqLayoutSpec pins the pruned
    * plans) — followed by the broadcast probe join that re-associates
    * query ids. Per-query LUT is |Q|·m·kc tiny rows, broadcast; the only
    * data-scale exchange is the (query_id, vec_id, partial-sum)
    * aggregation. No candidate dedup: index layouts follow the manifested
    * compaction discipline ([[graft.streaming.Generations]]), so readers
    * never observe a fold together with its sources. */
  def searchIvfPqIndex(index: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, m: Int, subDim: Int, centroids: DataFrame,
      b: Seq[(Int, Int, Array[Double])],
      probesPre: Option[Seq[(Long, Long)]] = None): DataFrame = {
    val probePairs = probesPre.getOrElse(collectProbes(queries, centroids, nprobe))
    val cells = probePairs.map(_._2).distinct.sorted
    val spark = index.sparkSession
    import spark.implicits._
    val probes = probePairs.toDF("query_id", "cell_id")
    val lutRows = pqLutRows(queries, m, subDim, b)
      .withColumnRenamed("cell", "code")
    val cand = index.filter(col("cell_id").isin(cells: _*))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val scored = cand
      .join(broadcast(lutRows), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "vec_id")
      .agg(round(sum(col("w")), 6).as("score"))
    topKCut(scored, k)
  }

  def topKPqIvf(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    topKPqIvf(emb, defaultQueries(emb), k, nprobe = 4, m = 8, kc = 16, subDim = 8)
  }

  /** TWO-STAGE refined ANN serve — the candidate-generation → exact
    * re-rank pattern production systems ship as a refine wrapper over a
    * compressed index (Jégou et al., TPAMI 2011 §V.C's reranking with
    * source coding; public): ADC distances are approximations, so the
    * serve path widens the IVF-PQ cut to r·k candidates per query and
    * re-scores JUST those on their exact embeddings, returning the top k
    * by true cosine. Refined recall at k dominates the unrefined cut
    * whenever a true neighbor survives the wide cut but ADC mis-ranks it
    * below k — the standard recall/latency dial (r=1 is the plain
    * search; r=|cell| candidates is IVF-exact).
    *
    * Scale shape: stage 1 is the audited prune+ADC plan; its r·k·|Q|
    * result is COLLECTED (the probe-set bounded class) so stage 2's
    * vector fetch is a literal `vec_id IN (…)` AT THE SCAN — parquet
    * row-group / bucket pruning reads only the candidate vectors, never
    * a second corpus pass (the whole reason to rerank from a compressed
    * index at 100 TB: full vectors are touched for |Q|·r·k rows only).
    * Re-scoring and the final k-cut run over driver-scale constants. */
  def topKPqIvfRefined(emb: DataFrame, queries: DataFrame, k: Int, r: Int,
      nprobe: Int, m: Int, subDim: Int, centroids: DataFrame,
      b: Seq[(Int, Int, Array[Double])]): DataFrame = {
    val cand = topKPqIvfWith(emb, queries, k * r, nprobe, m, subDim,
        centroids, b)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
    refineCandidates(emb, queries, cand, k)
  }

  /** The exact re-rank half of [[topKPqIvfRefined]], reusable over any
    * candidate generator (ADC, LSH, a streamed index): fetch the
    * candidate vectors through a scan-pruning literal id filter,
    * re-associate query ids via the broadcast (query, cand) pair set,
    * score with true cosine, and k-cut. NaN (zero-norm junk that slipped
    * through a compressed-score stage) is skipped inside the aggregate —
    * the [[topKCosine]] contract. */
  def refineCandidates(emb: DataFrame, queries: DataFrame,
      cand: Seq[(Long, Long)], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ids = cand.map(_._2).distinct.sorted
    val candDf = cand.toDF("query_id", "vec_id")
    val scored = emb.filter(col("vec_id").isin(ids: _*))
      .join(broadcast(candDf), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
    topKCut(scored, k)
  }

  /** CORRECTNESS instantiation of the refined serve: the seeded
    * quantizers of `sim_topk_ivfpq` widened 4× and re-ranked exactly. */
  def topKPqIvfRefined(spark: SparkSession, dir: String, k: Int = 5,
      r: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    topKPqIvfRefined(emb, defaultQueries(emb), k, r, nprobe = 4, m = 8,
      subDim = 8, defaultCentroids(emb), pqCodebook())
  }

  /** Two-stage refined serve over ANY prebuilt inverted-list `index`
    * ([[ivfPqIndexRows]] rows — landed bucketed table, streaming
    * maintainer generations, or in-memory): stage 1 is the pruned
    * ADC candidate plan widened to r·k, its |Q|·r·k result collected
    * (the probe-set bounded class), stage 2 the literal-id-pruned exact
    * re-rank ([[refineCandidates]]). The shared serve half of
    * [[topKPqIvfRefinedLanded]], the index-backed hybrid dense leg
    * ([[TextAnalysis.hybridSearchCompressed]]), and the streamed hybrid
    * serve ([[graft.streaming.StreamHybrid.searchSteady]]). */
  def refinedSearchIndex(emb: DataFrame, index: DataFrame,
      queries: DataFrame, k: Int, r: Int, nprobe: Int, m: Int, subDim: Int,
      centroids: DataFrame, b: Seq[(Int, Int, Array[Double])],
      probesPre: Option[Seq[(Long, Long)]] = None): DataFrame = {
    val cand = searchIvfPqIndex(index, queries, k * r, nprobe, m, subDim,
        centroids, b, probesPre)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
    refineCandidates(emb, queries, cand, k)
  }

  /** Refined serve FROM THE LANDED ARTIFACTS — stage 1 is
    * [[topKPqIvfLanded]]'s bucket-pruned candidate plan widened to r·k
    * (landed trained quantizers, cell-bucketed code table, no training
    * or encode anywhere), stage 2 the same literal-id-pruned exact
    * re-rank: the full production read path of a refined compressed
    * index, restart-durable. Same answer, same oracle class as the
    * trained refine (training and encode are deterministic). */
  def topKPqIvfRefinedLanded(spark: SparkSession, dir: String, k: Int = 5,
      r: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizers(spark, dir)
    refinedSearchIndex(emb, ensureIvfPqCodes(spark, dir),
      defaultQueries(emb), k, r, nprobe = 4, m = 8, subDim = 8, centDf, book)
  }

  /** ANN quality evaluation — recall@k of the IVF-PQ search against the
    * exact cosine ground truth, per probe query: the operational metric
    * every ANN deployment monitors (PQ distance is an approximation and
    * IVF pruning can miss cells; recall is the number that says whether
    * nprobe/codebook sizing is adequate BEFORE a bad index serves
    * production traffic). Runs both searches over the same probe set and
    * counts the overlap.
    *
    * Scale shape: the expensive branches are exactly the two audited
    * search plans (IVF-PQ prune+ADC, exact scan+topk_by) — the overlap
    * join and per-query counts run over ≤ |Q|·k rows, driver-scale
    * constants. At 100 TB the exact branch is the cost (that is what
    * ground truth costs); a deployment runs this on a sampled probe set,
    * which is exactly the |Q|-bounded shape here. */
  def annRecall(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallAgainstExact(topKPqIvf(spark, dir, k), spark, dir, k)

  /** [[annRecall]] for the REFINED serve ([[topKPqIvfRefined]]) — the
    * number that shows the refine dial paying for itself: per probe
    * query, recall can only rise vs the unrefined entry (the wide-cut
    * dominance argument, spec-pinned), and the monitored pair is what
    * a deployment tunes r against. */
  def annRecallRefined(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    recallAgainstExact(
      topKPqIvfRefined(spark, dir, k), spark, dir, k)

  /** Recall@depth of the INDEX-BACKED hybrid dense leg against the
    * exact dense leg it replaced — the annRecall monitor for the
    * hybrid-retrieval dial ([[TextAnalysis.hybridDocsSteady]]'s
    * approximate branch vs [[TextAnalysis.hybridDocs]]'s exact one,
    * same probe vector, same depth): the number a deployment reads
    * before trusting the compressed serve, and tunes (r, nprobe)
    * against. Scale shape: the ann branch is the audited refined
    * landed serve; the exact branch is what ground truth costs
    * (corpus-linear — run on the bounded probe set, as here). */
  def hybridDenseRecall(spark: SparkSession, dir: String,
      depth: Int = 50, r: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val (centDf, book) = loadLandedQuantizers(spark, dir)
    // the exact ground-truth leg (one corpus-linear scan, lazy until an
    // action) and the ANN leg's eager probe/candidate collects are
    // independent chains — overlap them (guide §2.6 via [[overlapJobs]];
    // the r17 verdict ask). The exact leg pins its ≤ depth·|Q|-row cut
    // (bounded by construction) so the fusion tail reads a materialized
    // leaf; values are unchanged on both legs.
    val (exact, ann) = overlapJobs(spark)(
      topKCosine(emb, queries, depth).select("query_id", "vec_id")
        .localCheckpoint()) {
      refinedSearchIndex(emb, ensureIvfPqCodes(spark, dir), queries,
          depth, r, nprobe = 4, m = 8, subDim = 8, centDf, book)
        .select("query_id", "vec_id")
    }
    val overlap = ann.join(exact, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    ann.select("query_id").distinct()
      .join(overlap, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / lit(depth.toDouble), 6)
          .as("recall"))
  }

  private def recallAgainstExact(ann0: => DataFrame, spark: SparkSession,
      dir: String, k: Int): DataFrame = {
    // the exact ground-truth leg and the ANN leg (whose probe/candidate
    // collects — for the refined form, the whole stage-1 ADC search —
    // run eagerly at construction) are independent chains: overlap them
    // (guide §2.6 via [[overlapJobs]]; the r17 verdict ask). The exact
    // cut pins ≤ k·|Q| rows — bounded by construction.
    val (exact, ann1) = overlapJobs(spark)(
      topKCosine(spark, dir, k).select("query_id", "vec_id")
        .localCheckpoint())(ann0)
    val ann = ann1.select("query_id", "vec_id")
    val overlap = ann.join(exact, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
    ann.select("query_id").distinct()
      .join(overlap, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(coalesce(col("n_overlap"), lit(0L)) / lit(k.toDouble), 6)
          .as("recall"))
  }

  /** Corpus cluster assignments under the TRAINED k-means centroids —
    * the labeling a user actually consumes after [[kmeansCentroids]]
    * (cluster-then-sample, cluster-balanced training mixes, per-cluster
    * dedup all start here). The assignment stage is the TWO-LEVEL form
    * ([[ivfAssignHier]], round-14 adoption): with SemDedup sizing
    * (k ≈ N/29) the flat argmax is O(N²/29) — the one super-linear term
    * the sf1 registry run measured (3.2–3.9× wall for 10× rows); the
    * two-level argmax is O(N·√k) within the documented IVF recall
    * trade. The exact flat form stays available as
    * [[kmeansAssignmentsFlat]] (the crossover comparator). */
  def kmeansAssignments(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    ivfAssignHier(emb, kmeansCentroidsAuto(emb)).select("vec_id", "cell_id")
  }

  /** STEADY-STATE form of [[kmeansAssignments]] — two-level assignment
    * under the LANDED trained centroids ([[landQuantizers]]), no Lloyd's
    * over the corpus in the plan: the timed cost is the O(N·√k)
    * production labeling pass (training is a separate, amortized land;
    * the coarse level trains over the k centroid ROWS per call — o(N·√k),
    * landable alongside the quantizers if a deployment wants it). Same
    * centroids (the trainers are deterministic), same answer, same
    * oracle as the retrain entry — and the same plan as
    * [[kmeansAssignmentsHier]], which this adoption made the default. */
  def kmeansAssignmentsSteady(spark: SparkSession, dir: String): DataFrame =
    kmeansAssignmentsHier(spark, dir)

  /** FLAT exact assignment under the LANDED centroids — r13's
    * `sim_kmeans_assign_steady` plan, kept as a named entry after the
    * hier adoption: (a) the exactness baseline the two-level recall
    * trade is measured against, (b) the flat-vs-hier crossover
    * comparator (BASELINE.md series — flat wins below ~100 k vectors
    * where the whole N·k cross is smaller than the coarse-training job
    * floor), (c) the right call when k is FIXED rather than ∝ N. The
    * O(N·k) cross is this entry's documented cost. */
  def kmeansAssignmentsFlat(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    ivfAssign(emb, loadLandedQuantizers(spark, dir)._1).select("vec_id", "cell_id")
  }

  /** EMBEDDING-DISTRIBUTION drift — the Population Stability Index over
    * trained cells, the published model-monitoring recipe (PSI:
    * Σ (p_ref − p_cur)·ln(p_ref/p_cur) over a fixed binning; < 0.1 is
    * conventionally stable, > 0.25 actionable) applied where a vector
    * pipeline needs it: is TODAY'S embedding traffic still distributed
    * like the corpus the quantizers/indexes were trained on? The
    * "binning" is the coarse quantizer itself — cells trained on the
    * REFERENCE side only (the production asymmetry: the monitored slice
    * never influences its own yardstick), both slices assigned under the
    * identical argmax, counts add-one smoothed over the full cell list
    * so an emptied cell contributes signal instead of a log blowup.
    *
    * Scale shape: two bounded corpus×constant broadcast crosses +
    * two-phase counts (one row per cell crosses), a cell-list join, and
    * a 1-row totals broadcast — the monitor costs two labeling passes,
    * nothing more. Deterministic 6-dp at every stage (p's rounded
    * BEFORE the contribution — the llr discipline). */
  def psiDrift(emb: DataFrame, initEvery: Int = 29,
      iters: Int = 3): DataFrame = {
    val base = emb.filter(col("vec_id") % 2 === 0)
    val cur = emb.filter(col("vec_id") % 2 =!= 0)
    psiDriftOver(base, cur, kmeansCentroidsAuto(base, initEvery, iters))
  }

  /** The PSI tail over ANY (reference, current, centroids) triple —
    * reusable by the streamed monitor against landed quantizers. Both
    * slices bin through the TWO-LEVEL assignment (round-14 adoption —
    * one [[hierIndex]] for both passes: the binning function must be
    * the SAME on both sides, and it must be the one the gates/indexes
    * actually assign with, or the monitor reads quantizer disagreement
    * as traffic drift). */
  def psiDriftOver(base: DataFrame, cur: DataFrame,
      centroids: DataFrame): DataFrame = {
    val (coarseLive, grouped) = hierIndex(centroids)
    psiFromCounts(centroids.select("cell_id"),
      ivfAssignHierWith(base, coarseLive, grouped)
        .groupBy("cell_id").agg(count(lit(1)).as("n_base")),
      ivfAssignHierWith(cur, coarseLive, grouped)
        .groupBy("cell_id").agg(count(lit(1)).as("n_cur")))
  }

  /** The smoothing + contribution tail over already-aggregated per-cell
    * counts — what a monitor with LANDED baseline counts (or a streamed
    * arrival index) actually runs. */
  def psiFromCounts(cells: DataFrame, nBase: DataFrame,
      nCur: DataFrame): DataFrame = {
    val joined = cells
      .join(nBase, Seq("cell_id"), "left")
      .join(nCur, Seq("cell_id"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = joined.agg(sum("n_base").as("tb"), sum("n_cur").as("tc"),
      count(lit(1)).as("k"))
    joined.crossJoin(broadcast(tot))
      .select(col("cell_id"), col("n_base"), col("n_cur"),
        round((col("n_base") + lit(1.0)) / (col("tb") + col("k")), 6)
          .as("p_base"),
        round((col("n_cur") + lit(1.0)) / (col("tc") + col("k")), 6)
          .as("p_cur"))
      .select(col("cell_id"), col("n_base"), col("n_cur"),
        col("p_base"), col("p_cur"),
        round((col("p_base") - col("p_cur")) *
          log(col("p_base") / col("p_cur")), 6).as("contrib"))
  }

  /** CORRECTNESS instantiation: even vec_ids are the reference slice,
    * odd the monitored slice. */
  def psiDriftEmbeddings(spark: SparkSession, dir: String): DataFrame =
    psiDrift(Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding"))

  /** Cluster-balanced sampling: at most `k` vectors per trained k-means
    * cell, picked by a DETERMINISTIC pseudo-random order (md5 of the id —
    * reproducible across runs, engines, and partitionings, the same
    * device as the hash samplers) — the diversity cap a training mix
    * applies so no dense cluster dominates the sample. The per-cell cut
    * runs through TopKPerKey's bounded partial heaps BEFORE the exchange;
    * at most k rows per cell cross. */
  def clusterSample(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    clusterSampleFrom(kmeansAssignments(spark, dir), k)

  /** STEADY-STATE [[clusterSample]]: the same per-cell capped draw over
    * [[kmeansAssignmentsSteady]]'s landed-centroid labeling. */
  def clusterSampleSteady(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    clusterSampleFrom(kmeansAssignmentsSteady(spark, dir), k)

  private def clusterSampleFrom(asg: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey(
      asg.withColumn("h", md5(col("vec_id").cast("string"))),
      Seq("cell_id"), Seq(col("h").asc, col("vec_id").asc), k)
      .select("cell_id", "vec_id")

  /** k-NN GRAPH construction — every vector's `nn` nearest same-cell
    * neighbors by true cosine, the foundational batch primitive under
    * graph-based dedup/diversity filtering and NN-Descent-class index
    * builds (Dong et al., WWW 2011 — public): all-pairs is quadratic, so
    * candidates are blocked by the trained coarse cells (the SemDedup
    * blocking — two vectors compete only if k-means agrees they live in
    * the same region) and each cell runs its pairwise scoring
    * independently. Missing a cross-cell true neighbor is the documented
    * approximation, exactly IVF's nprobe=1 recall trade.
    *
    * Scale shape: the cell self-join is a key equi-join (never
    * all-pairs); per-cell cost is |cell|² — bounded by the trainer's
    * cell balance, with AQE skew-split as the degrade for a hot cell —
    * and the `topk_by` k-cut forwards at most nn rows per vector per
    * partition, so the post-join exchange carries the graph edges, not
    * the candidate pairs. Zero-norm vectors emit no edges (NaN skipped
    * in the aggregate) and rank in none (NaN never compares ahead) —
    * symmetric with the oracle's NOT isnan gate. */
  def knnGraph(emb: DataFrame, centroids: DataFrame, nn: Int): DataFrame = {
    val (coarseLive, grouped) = hierIndex(centroids)
    knnGraphWith(emb, coarseLive, grouped, nn)
  }

  /** [[knnGraph]] against a PREBUILT (or landed — [[ensureHierIndex]])
    * two-level assignment index: the steady serves' form, where the
    * coarse training is amortized to the land. */
  def knnGraphWith(emb: DataFrame, coarseLive: DataFrame,
      grouped: DataFrame, nn: Int): DataFrame = {
    // persist the assignment so the corpus is scored against the
    // centroids ONCE, not once per self-join side (the semanticDedupWith
    // discipline — at scale the assignment scan is the dominant term);
    // the assignment itself is the TWO-LEVEL argmax (round-14 adoption:
    // k ∝ N here, so the flat N·k cross is the measured super-linear
    // term — see ivfAssignHier's scaladoc for the recall trade)
    val asg = ivfAssignHierWith(emb, coarseLive, grouped)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = asg
      .select(col("vec_id").as("query_id"), col("cell_id"),
        col("embedding").as("q_emb"))
      .join(asg.select(col("vec_id"), col("cell_id"), col("embedding")),
        Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
    val graph = topKCut(scored, nn)
      .select(col("query_id").as("vec_id"), col("vec_id").as("nbr_id"),
        col("score"))
    // audit escape hatch (the Dedup.materializeAndRelease contract): lazy
    // mode returns the un-checkpointed DAG for PlanAudit, keeping the
    // persist alive; jobs materialize and release the cached assignment
    if (sys.props.get("graft.dedup.lazyPlans").contains("true")) graph
    else {
      val reliable =
        graph.sparkSession.sparkContext.getCheckpointDir.isDefined
      val out = if (reliable) graph.checkpoint() else graph.localCheckpoint()
      asg.unpersist()
      out
    }
  }

  /** Per-vector top-nn cut over (vec_id, nbr_id, score) edge rows — the
    * [[knnGraph]] tail as a standalone fold, shared with the streamed
    * maintainer ([[graft.streaming.StreamKnn]])'s serve and compaction:
    * top-nn is ABSORBING (top-nn(top-nn(A) ∪ B) = top-nn(A ∪ B), ties
    * (score DESC, nbr ASC) inside `topk_by`), which is what makes edge
    * generations foldable without replaying old pairs. */
  def knnCut(edges: DataFrame, nn: Int): DataFrame =
    topKCut(edges.select(col("vec_id").as("query_id"),
      col("nbr_id").as("vec_id"), col("score")), nn)
      .select(col("query_id").as("vec_id"), col("vec_id").as("nbr_id"),
        col("score"))

  /** CORRECTNESS instantiation: 4 neighbors per vector under the TRAINED
    * k-means cells (size-dispatch-trained — same centroids and oracle CTEs
    * as `sim_kmeans_assign`). */
  def knnGraphDocs(spark: SparkSession, dir: String, nn: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    knnGraph(emb, kmeansCentroidsAuto(emb), nn)
  }

  /** STEADY-STATE [[knnGraphDocs]]: cells AND the two-level assignment
    * index from the LANDED artifacts ([[landQuantizers]] +
    * [[loadLandedHierIndex]]) — no Lloyd's anywhere in the plan; the
    * timed cost is the two-stage assignment + the blocked pairwise
    * scoring + k-cut, the recurring production build. Same answer, same
    * oracle as the retrain entry. */
  def knnGraphSteady(spark: SparkSession, dir: String, nn: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (coarseLive, grouped) = loadLandedHierIndex(spark, dir)
    knnGraphWith(emb, coarseLive, grouped, nn)
  }

  /** DENSITY-BASED pruning — the data-curation decision the k-NN graph
    * exists to feed (the D4 / SSL-prototypicality line, Tirumala et al.
    * 2023; Sorscher et al. 2022 — public): vectors in the DENSEST
    * embedding regions are the most mutually redundant, so score each
    * vector by density = mean cosine of its nn nearest same-cell
    * neighbors ([[knnGraph]]) and drop the densest `pct` of the scored
    * corpus. Unlike SemDedup's pairwise τ-threshold (drop verbatim-class
    * twins), density pruning thins whole over-represented NEIGHBORHOODS
    * — the two compose: dedup first, then prune density.
    *
    * Contract details pinned by spec + oracle: the cutoff is the exact
    * (1−pct) percentile of the density distribution (Spark `percentile`
    * ≡ DuckDB `quantile_cont`, 6-dp rounded — the calibrated-quality
    * convention); ties at the cutoff KEEP; vectors with NO graph edges
    * (zero-norm junk, singleton cells) carry NULL density and KEEP —
    * nothing is redundant about an isolated point.
    *
    * Scale shape: the graph build dominates (E144's blocked equi-join);
    * density is a two-phase avg over graph edges (≤ nn rows per vector),
    * the cutoff is a 1-row aggregate broadcast back, and the keep filter
    * is scan-side. */
  def densityPrune(emb: DataFrame, centroids: DataFrame, nn: Int,
      pct: Double): DataFrame =
    densityPruneFrom(emb, knnGraph(emb, centroids, nn), pct)

  /** The density tail over ANY k-NN graph — shared by the retrain
    * entry, the landed-index steady serve, and the streamed graph. */
  def densityPruneFrom(emb: DataFrame, graph: DataFrame,
      pct: Double): DataFrame = {
    val dens = graph
      .groupBy("vec_id")
      .agg(round(avg(col("score")), 6).as("density"))
    val cutoff = dens.agg(
      round(percentile(col("density"), lit(1.0 - pct)), 6).as("cutoff"))
    emb.select("vec_id")
      .join(dens, Seq("vec_id"), "left_outer")
      .crossJoin(broadcast(cutoff))
      .filter(col("density").isNull || col("density") <= col("cutoff"))
      .select(col("vec_id"), col("density"))
  }

  /** CORRECTNESS instantiation: drop the densest quintile under the
    * TRAINED cells (same centroids and graph as `sim_knn_graph`). */
  def densityPruneDocs(spark: SparkSession, dir: String, nn: Int = 4,
      pct: Double = 0.2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    densityPrune(emb, kmeansCentroidsAuto(emb), nn, pct)
  }

  /** STEADY-STATE [[densityPruneDocs]]: landed centroids AND landed
    * hier index — no Lloyd's anywhere in the plan. Same answer, same
    * oracle. */
  def densityPruneSteady(spark: SparkSession, dir: String, nn: Int = 4,
      pct: Double = 0.2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (coarseLive, grouped) = loadLandedHierIndex(spark, dir)
    densityPruneFrom(emb, knnGraphWith(emb, coarseLive, grouped, nn), pct)
  }

  /** The END-TO-END trained production ANN stack: k-means coarse cells
    * ([[kmeansCentroids]]) × per-subspace-Lloyd's PQ codebook
    * ([[pqCodebookTrained]]) through the same inverted-list prune +
    * ADC-score plan. Training cost is the two trainers' documented
    * bounded-shuffle iterations; serving cost is identical to the seeded
    * form. */
  def topKPqIvfTrained(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    // The two quantizer trainings are INDEPENDENT job chains (the coarse
    // k-means never reads the codebook and vice versa — the raw-vector
    // book, unlike the residual form's). Overlap them from a second
    // driver thread (guide §2.6): each trainer is a sequence of
    // small-result barriers whose tails leave most executor slots idle,
    // and the scheduler back-fills those slots with the other trainer's
    // jobs. Results are unchanged — same two trainings, same inputs.
    // r18: the overlap runs through [[overlapJobs]] (r17 advisory — the
    // dedicated-thread/description/await-in-finally discipline), and the
    // probe assignment (which needs only the coarse cells) now also
    // overlaps the codebook trainer's tail on the main thread.
    val queries = defaultQueries(emb)
    val (book, (cents, probes)) = overlapJobs(spark)(pqCodebookTrained(emb)) {
      val cents = kmeansCentroidsAuto(emb)
      (cents, collectProbes(queries, cents, nprobe = 4))
    }
    searchIvfPqIndex(ivfPqIndexRows(emb, m = 8, subDim = 8, cents, book),
      queries, k, nprobe = 4, m = 8, subDim = 8, cents, book, Some(probes))
  }

  /** Coarse-cell RESIDUALS — r = e − c(cell(e)), computed in DOUBLE so
    * the subtraction is bit-identical cross-engine: the input of the
    * residual-PQ form below. One assignment cross + a broadcast centroid
    * fetch + a row-local zip; the output column is named `embedding` so
    * every PQ trainer/encoder consumes it unchanged. */
  def residuals(emb: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(emb, centroids)
      .join(broadcast(centroids), "cell_id")
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("embedding"), col("c_emb"),
          (x, c) => x.cast("double") - c.cast("double")).as("embedding"))

  /** RESIDUAL IVF-PQ index rows — the encode production systems
    * actually ship (Jégou et al., TPAMI 2011 §IV.B; the FAISS IVFPQ
    * default): PQ quantizes the RESIDUAL r = e − c instead of the raw
    * vector, because residuals concentrate near the origin once the
    * coarse quantizer has soaked up the between-cell variance — the
    * same codebook budget then spends its cells on a far smaller
    * support, cutting quantization error (spec-measured vs the raw
    * form). Same (vec_id, cell_id, sub, code) layout as
    * [[ivfPqIndexRows]], so landing/bucketing/pruning carry over. */
  def ivfPqResIndexRows(resid: DataFrame, m: Int, subDim: Int,
      b: Seq[(Int, Int, Array[Double])]): DataFrame =
    pqEncodeWithBook(resid.select("vec_id", "embedding"), m, subDim, b)
      .select(col("vec_id"), posexplode(
        array((0 until m).map(s => col(s"code_$s")): _*)))
      .toDF("vec_id", "sub", "code")
      .join(resid.select("vec_id", "cell_id"), "vec_id")

  /** [[collectProbes]] carrying the raw q·c dot of each probed cell —
    * the additive term of the residual ADC decomposition
    * q·v ≈ q·c + Σ_s q_s·r̂_s. Same bounded-collect class; the dot is a
    * sequential left fold, matching the oracle's `list_inner_product`
    * order exactly. */
  def collectProbesDot(queries: DataFrame, centroids: DataFrame,
      nprobe: Int): Seq[(Long, Long, Double)] = {
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cs").desc, col("cell_id").asc)
    val qcDot = aggregate(zip_with(col("q_emb"), col("c_emb"),
      (x, c) => x.cast("double") * c.cast("double")), lit(0.0d), (a, t) => a + t)
    queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("cell_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("c_emb")).as("cs"),
        qcDot.as("qc"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id").cast("long"), col("cell_id").cast("long"),
        col("qc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  /** The serve half of the residual form: prune to the probed cells
    * (same literal `cell_id IN (…)` scan prune as [[searchIvfPqIndex]]),
    * then score q·v ≈ q·c_probed + Σ_s LUT — the per-(query, cell) dot
    * rides the broadcast probe rows, the LUT is unchanged (the residual
    * decomposition reuses the same subspace dots). 6-dp round before
    * the k-cut, the shared ADC drift rule. */
  def searchIvfPqResIndex(index: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int, m: Int, subDim: Int, centroids: DataFrame,
      b: Seq[(Int, Int, Array[Double])],
      probesPre: Option[Seq[(Long, Long, Double)]] = None): DataFrame = {
    val probePairs = probesPre.getOrElse(
      collectProbesDot(queries, centroids, nprobe))
    val cells = probePairs.map(_._2).distinct.sorted
    val spark = index.sparkSession
    import spark.implicits._
    val probes = probePairs.toDF("query_id", "cell_id", "qc")
    val lutRows = pqLutRows(queries, m, subDim, b)
      .withColumnRenamed("cell", "code")
    val cand = index.filter(col("cell_id").isin(cells: _*))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
    val scored = cand
      .join(broadcast(lutRows), Seq("query_id", "sub", "code"))
      .groupBy("query_id", "vec_id")
      .agg(round(max(col("qc")) + sum(col("w")), 6).as("score"))
    topKCut(scored, k)
  }

  /** The TRAINED residual IVF-PQ entry — both quantizers trained the
    * production way: k-means coarse cells over the corpus, then
    * per-subspace Lloyd's over the RESIDUAL table (training on
    * residuals is the point — a book trained on raw vectors wastes its
    * cells on between-cell variance the coarse quantizer already
    * removed). The residual table feeds TWO consumers — the codebook
    * trainer and the encode — and until r17 was computed twice (a full
    * assignment + subtraction pass each, the then-documented retrain
    * cost). It is now pinned ONCE (localCheckpoint — the multi-consumer
    * mid-plan convention shared with `modularityDocs`; byte bound:
    * corpus × (dim doubles + ids), executor-local — the same
    * materialization a landed build writes as parquet anyway). One full
    * assignment + subtraction pass saved per rebuild. */
  def topKPqIvfResTrained(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val cents = kmeansCentroidsAuto(emb)
    val resid = residuals(emb, cents).localCheckpoint()
    // the residual-book training and the probe-dot collect are
    // independent job chains once cents and the pinned residual table
    // exist — overlap them the way the raw trained form overlaps its two
    // trainers ([[overlapJobs]], guide §2.6)
    val queries = defaultQueries(emb)
    val (book, probes) = overlapJobs(spark)(
      pqCodebookTrained(resid.select("vec_id", "embedding")))(
      collectProbesDot(queries, cents, nprobe = 4))
    searchIvfPqResIndex(ivfPqResIndexRows(resid, m = 8, subDim = 8, book),
      queries, k, nprobe = 4, m = 8, subDim = 8, cents, book, Some(probes))
  }

  /** Land the RESIDUAL-form artifacts next to the raw ones: the
    * residual-trained codebook (`<prefix>_res_codebook`) and the
    * cell-BUCKETED residual code table (`<prefix>_res_codes` — the
    * [[landIvfPqCodes]] inverted-list layout, so the residual serve
    * prunes buckets identically). Coarse centroids are shared with the
    * raw form ([[landQuantizers]] — same k-means, same corpus). */
  def landResQuantizers(spark: SparkSession, dir: String, path: String,
      m: Int = 8, subDim: Int = 8, buckets: Int = 16): Unit = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, _) = loadLandedQuantizers(spark, dir)
    val resid = residuals(emb, centDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val book = pqCodebookTrained(resid.select("vec_id", "embedding"))
    val prefix = quantizerPrefix(dir)
    import spark.implicits._
    book.toDF("sub", "cell", "cv")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/res_codebook").saveAsTable(s"${prefix}_res_codebook")
    graft.sources.Layout.writeBucketed(
      ivfPqResIndexRows(resid, m, subDim, book),
      s"${prefix}_res_codes", Seq("cell_id"),
      Seq("cell_id", "vec_id", "sub"), buckets, s"$path/res_codes")
    resid.unpersist()
    ()
  }

  /** Ensure the residual artifacts are landed and return (codes table,
    * coarse centroid table, residual book literals). */
  def ensureResArtifacts(spark: SparkSession, dir: String): (DataFrame, DataFrame, Seq[(Int, Int, Array[Double])]) = {
    val prefix = quantizerPrefix(dir)
    graft.sources.Landing.ensureLanded(spark, s"${prefix}_res",
      Seq(s"${prefix}_res_codebook", s"${prefix}_res_codes")) { path =>
      landResQuantizers(spark, dir, path)
    }
    val book = spark.table(s"${prefix}_res_codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .toSeq.sortBy(t => (t._1, t._2))
    (spark.table(s"${prefix}_res_codes"),
      loadLandedQuantizers(spark, dir)._1, book)
  }

  /** Residual IVF-PQ serve FROM THE LANDED ARTIFACTS — no training and
    * no encode anywhere in the plan: coarse centroids off their landed
    * table, residual book literals off the landed `_res_codebook`, and
    * candidates from the cell-BUCKETED `_res_codes` through the same
    * bucket-pruned scan as [[topKPqIvfLanded]]. Same answer, same
    * oracle as the retrain entry (both trainings and the residual
    * subtraction are deterministic). */
  def topKPqIvfResLanded(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (codes, centDf, book) = ensureResArtifacts(spark, dir)
    searchIvfPqResIndex(codes, defaultQueries(emb), k, nprobe = 4,
      m = 8, subDim = 8, centDf, book)
  }

  /** The composed BEST production read path — residual candidates,
    * exact re-rank, everything landed: stage 1 is
    * [[topKPqIvfResLanded]]'s bucket-pruned residual ADC widened to
    * r·k (the best compressed scorer), stage 2 the literal-id-pruned
    * exact re-rank ([[refineCandidates]]). The two dials compose
    * independently: residual encoding cuts the compressed-score error
    * (so the wide cut ranks better candidates in), refine removes the
    * remaining compression error from the final k. */
  def topKPqIvfResRefined(spark: SparkSession, dir: String, k: Int = 5,
      r: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (codes, centDf, book) = ensureResArtifacts(spark, dir)
    val cand = searchIvfPqResIndex(codes, defaultQueries(emb), k * r,
        nprobe = 4, m = 8, subDim = 8, centDf, book)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"))
      .collect().map(rw => (rw.getLong(0), rw.getLong(1))).toSeq.sorted
    refineCandidates(emb, defaultQueries(emb), cand, k)
  }

  /** Catalog table-name prefix for the LANDED trained quantizers of a
    * corpus dir: MD5 of the dir (same collision rationale as
    * [[graft.operators.Dedup.steadyIndexPrefix]] — a 31-bit
    * `String.hashCode` clash between two corpus dirs would silently
    * serve with the wrong quantizers). Public so the spec pins the
    * naming scheme. */
  def quantizerPrefix(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"ivfpq_quant_$suffix"
  }

  /** Train and LAND both IVF-PQ quantizer artifacts as parquet catalog
    * tables — the durable form of what [[topKPqIvfSteady]] previously
    * kept only in a process-local memo: `<prefix>_centroids`
    * (cell_id, c_emb — the k-means coarse cells) and `<prefix>_codebook`
    * (sub, cell, cv — the per-subspace Lloyd's PQ book). Both are
    * bounded-size (k rows / m·kc rows); landing is one tiny write each,
    * and a restarted process RELOADS instead of retraining (hours at
    * scale). The `landNearDupIndex` / BPE-merge-table pattern applied to
    * ANN. */
  def landQuantizers(spark: SparkSession, dir: String, path: String): Unit = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val prefix = quantizerPrefix(dir)
    import spark.implicits._
    kmeansCentroidsAuto(emb)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/centroids").saveAsTable(s"${prefix}_centroids")
    pqCodebookTrained(emb).toDF("sub", "cell", "cv")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/codebook").saveAsTable(s"${prefix}_codebook")
  }

  /** Ensure the trained quantizers are landed for `dir` and return them:
    * the centroid DataFrame straight off the landed table (it joins as a
    * broadcast side — no collect needed) and the codebook collected to
    * plan literals (m·kc rows — the bounded-collect class the trainers
    * already use). BOTH tables must exist or both are re-landed: a land
    * that failed between the two writes must not wedge every later serve
    * on the missing codebook side. */
  def loadLandedQuantizers(spark: SparkSession, dir: String): (DataFrame, Seq[(Int, Int, Array[Double])]) = {
    val prefix = quantizerPrefix(dir)
    graft.sources.Landing.ensureLanded(spark, s"${prefix}_quant",
      Seq(s"${prefix}_centroids", s"${prefix}_codebook")) { path =>
      landQuantizers(spark, dir, path)
    }
    val book = spark.table(s"${prefix}_codebook").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .toSeq.sortBy(t => (t._1, t._2))
    (spark.table(s"${prefix}_centroids"), book)
  }

  /** Land the IVF-PQ inverted code list as a parquet catalog table
    * BUCKETED BY `cell_id` — the physical inverted-list layout: each
    * coarse cell's code rows live in a known bucket, so a serve-time
    * `cell_id IN (probed cells)` prunes buckets and reads ONLY the probed
    * inverted lists (at 100 TB that is the whole point of IVF — the
    * round-9 layout kept cell_id as an ordinary column and every query
    * scanned the full code table). Per-bucket sort (cell_id, vec_id, sub)
    * keeps each vector's m code rows adjacent. Bucket count: ≈ table
    * size / 128–256 MiB at scale (the [[graft.sources.Layout]] rule);
    * 16 here spans the trained cell count at test SF. */
  def landIvfPqCodes(spark: SparkSession, dir: String, path: String,
      m: Int = 8, subDim: Int = 8, buckets: Int = 16): Unit = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizers(spark, dir)
    graft.sources.Layout.writeBucketed(
      ivfPqIndexRows(emb, m, subDim, centDf, book),
      s"${quantizerPrefix(dir)}_codes", Seq("cell_id"),
      Seq("cell_id", "vec_id", "sub"), buckets, s"$path/codes")
  }

  /** Ensure the corpus dir's code list is landed ([[landIvfPqCodes]]) and
    * return it. First call on a fresh catalog pays one scan-side encode +
    * bucketed write (training lands via [[loadLandedQuantizers]] if
    * needed); every later call — including in a NEW process on the same
    * catalog — reads the table. */
  def ensureIvfPqCodes(spark: SparkSession, dir: String): DataFrame = {
    val table = s"${quantizerPrefix(dir)}_codes"
    graft.sources.Landing.ensureLanded(spark, table, Seq(table)) { path =>
      landIvfPqCodes(spark, dir, path)
    }
    spark.table(table)
  }

  /** IVF-PQ serve FROM THE LANDED ARTIFACTS — the restart-durable
    * production path: no Lloyd's and no scan-side encode anywhere in the
    * plan; the coarse centroids broadcast straight off their parquet
    * table, the codebook literals come from the landed book, and the
    * candidate rows come from the cell-BUCKETED landed code list
    * ([[ensureIvfPqCodes]]) through a bucket-pruned scan — per-query read
    * cost tracks probed cells, not corpus size. First call on a fresh
    * catalog pays one training+land (Bench's unmeasured warm-up, Verify's
    * only pass); every call after is serve-only. Same answer, same oracle
    * as the retrain entry (training and encode are deterministic). */
  def topKPqIvfLanded(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizers(spark, dir)
    searchIvfPqIndex(ensureIvfPqCodes(spark, dir), defaultQueries(emb),
      k, nprobe = 4, m = 8, subDim = 8, centDf, book)
  }

  /** STEADY-STATE form of [[topKPqIvfTrained]]: both trained quantizers —
    * the k-means centroid table (k rows) and the PQ codebook — come from
    * the LANDED artifact tables ([[landQuantizers]]), memoized per corpus
    * dir so repeat calls within a process skip even the tiny table reads.
    * A restarted process re-READS the landed tables (milliseconds)
    * instead of retraining (the round-8 TrieMap-only gap); the timed
    * passes measure the serve path only: assignment + encode + prune +
    * ADC. Same answer, same oracle as the retrain entry. Memo
    * invalidation contract: artifacts are keyed by corpus dir and assumed
    * immutable-per-dir (the testdata layout); a corpus rewritten in place
    * needs its `<prefix>_*` tables dropped to retrain. */
  private val trainedIvfPq = collection.concurrent.TrieMap[String,
    (Seq[(Long, Array[Float])], Seq[(Int, Int, Array[Double])])]()
  def topKPqIvfSteady(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (cents, book) = trainedIvfPq.getOrElseUpdate(dir, {
      import spark.implicits._
      val (centDf, b) = loadLandedQuantizers(spark, dir)
      (centDf.as[(Long, Array[Float])].collect().toSeq, b)
    })
    import spark.implicits._
    val centDf = cents.toDF("cell_id", "c_emb")
      .select(col("cell_id"), col("c_emb").cast("array<float>").as("c_emb"))
    topKPqIvfWith(emb, defaultQueries(emb), k, nprobe = 4, m = 8, subDim = 8,
      centDf, book)
  }

  /** Symmetric int8 embedding quantization: per-vector scale =
    * max|x|/127, q_i = round(x_i/scale) ∈ [−127, 127] — the 4× storage
    * and bandwidth cut (float32 → int8 + one scale) embedding stores
    * ship at 100 TB, dequantizing to x ≈ q·scale with error ≤ scale/2
    * per lane. Zero vectors keep scale 0 and all-zero codes (guarded
    * division). Pure scan-side projection, zero shuffles; |x| is taken
    * in DOUBLE on both engines so the scale (and therefore every code)
    * is bit-identical cross-engine. Output exploded row-locally to
    * (vec_id, lane, q, scale) scalar rows for the driver's comparator. */
  def int8Quantize(emb: DataFrame): DataFrame = {
    val absd = transform(col("embedding"), x => abs(x.cast("double")))
    emb.select(col("vec_id"),
        (array_max(absd) / lit(127.0d)).as("scale"), col("embedding"))
      .select(col("vec_id"), col("scale"), posexplode(col("embedding")))
      .toDF("vec_id", "scale", "lane", "x")
      .select(col("vec_id"), col("lane").cast("long").as("lane"),
        when(col("scale") === 0.0d, lit(0L))
          .otherwise(round(col("x").cast("double") / col("scale"), 0).cast("long"))
          .as("q"),
        round(col("scale"), 9).as("scale"))
  }

  def int8Embeddings(spark: SparkSession, dir: String): DataFrame =
    int8Quantize(Tables.load(spark, dir, "embeddings").select("vec_id", "embedding"))

  /** Seeded ±1 projection matrix (outDim × inDim) for [[rpProject]] —
    * a deterministic java.util.Random sign stream (the LCG is specified
    * behavior, identical on every JVM), so the SAME literal matrix lands
    * in the Spark plan and in the generated oracle SQL. */
  def rpSigns(outDim: Int, inDim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(outDim, inDim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Random-projection dimensionality reduction (the Johnson–Lindenstrauss
    * sign projection, Achlioptas JCSS'03 — public): out_i = e·s_i / √dim
    * with the seeded sign matrix baked in as plan literals. A pure
    * scan-side codegen projection — ZERO shuffles, ZERO joins at any
    * corpus size — which is exactly what a 100 TB pipeline runs to cut
    * embedding width before LSH/IVF indexing or brute-force scoring.
    * Output exploded row-locally to (vec_id, lane, v) scalar rows, 6-dp
    * rounded; litDot's left-fold matches the oracle's sequential
    * list_inner_product order. */
  def rpProject(emb: DataFrame, outDim: Int = 16, dim: Int = 64): DataFrame = {
    val signs = rpSigns(outDim, dim)
    val scale = math.sqrt(dim.toDouble)
    emb.select(col("vec_id"), posexplode(array(
      signs.toSeq.map(row =>
        round(litDot(col("embedding"), row) / lit(scale), 6)): _*)))
      .toDF("vec_id", "lane", "v")
      .select(col("vec_id"), col("lane").cast("long").as("lane"), col("v"))
  }

  def rpReduce(spark: SparkSession, dir: String): DataFrame =
    rpProject(Tables.load(spark, dir, "embeddings").select("vec_id", "embedding"))

  // --------------------------------------------------------------------
  // Embedding whitening (ZCA) — decorrelate the embedding space before
  // cosine indexing/dedup. Anisotropic encoder output (a few dominant
  // directions carrying most of the variance) makes cosine similarity
  // saturate — everything looks alike along the dominant axes — and
  // whitening the representation measurably improves retrieval/semantic
  // similarity (Su et al., "Whitening Sentence Representations for
  // Better Semantics and Faster Retrieval", arXiv:2103.15316 — public).
  // ZCA (W = U Λ^{-1/2} Uᵀ) rather than PCA so the whitened space stays
  // maximally close to the original orientation.
  //
  // Scale split (100 TB): the corpus-sized work is ONE moment pass —
  // mean vector + Gram matrix as d + d(d+1)/2 exact integer sums,
  // map-side combinable (the shuffle moves ~2 k groups per partition,
  // never rows); the eigensolve is d×d on the driver (d = 64 → trivial,
  // bounded by construction, never data-sized); the transform is a
  // row-local affine map against a broadcast d² literal matrix — a pure
  // scan-side projection with zero shuffles, the rpProject shape.
  //
  // Float discipline (the E203 micro-nat lesson applied to second
  // moments): each lane is 6-dp-rounded and lifted to integer MICROS
  // (×1e6, exact in a long), so every moment sum is an exact integer
  // sum — order-free, partitioning-free, engine-free — accumulated as
  // decimal(38,0) (micro² products are ≤1e12 each; 1e10 rows still fit
  // 38 digits with room). The one IEEE divide (+6-dp round) happens
  // AFTER the exact sum, so Spark's partial-agg order and DuckDB's
  // sequential order land on identical doubles.
  // --------------------------------------------------------------------

  /** Integer-lifted per-lane micros: round(x,6)·1e6 as long. */
  private def microLanes(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(e, x => round(round(x.cast("double"), 6) * 1e6).cast("long"))

  /** The exact integer moment sums of an embedding column, one relation:
    * (l, m, s) with 0 ≤ l ≤ m < dim → s = Σ micro_l·micro_m;
    * (l, -1, s) → s = Σ micro_l; (-1, -1, n) → the row count.
    *
    * ONE corpus scan, ONE partial-merge aggregate buffer, NO row fan-out
    * (r18): [[graft.functions.MomentSums]] folds each row's d lanes into
    * a per-partition buffer of all d(d+1)/2 + d + 1 exact 128-bit sums —
    * the exchange carries one ~50 KB buffer per partition and the output
    * explodes row-locally from the single merged buffer. The r15–r17
    * spelling generated d(d+1)/2 ≈ 2 145 scalar rows PER VECTOR (the
    * posexplode + tail-slice chain — ~42 M generated rows at sf0.1,
    * ~420 M at sf1) purely to re-group them by (l, m) in a two-phase
    * aggregate; the generation was row-local (the scale SHAPE was
    * right), but it was the registry's largest per-task constant
    * (guide §1.2 step 2). Sums are exact integers computed in full
    * 128-bit (the same overflow headroom as the old decimal(38,0)
    * arithmetic — see MomentSums), so they are order-free and the
    * relation is bit-identical to the fan-out form's. */
  def embedMomentSums(emb: DataFrame): DataFrame =
    emb.select(microLanes(col("embedding")).as("mi"))
      .agg(GraftFunctions.momentSums(col("mi")).as("ms"))
      .select(explode(col("ms")).as("r"))
      .select(col("r.l").as("l"), col("r.m").as("m"), col("r.s").as("s"))

  /** CORRECTNESS/bench entry (`sim_whiten_moments`): the moment pass over
    * the embeddings corpus, reported in x-units — v = s/n/1e12 for pair
    * rows, s/n/1e6 for first-moment rows, n itself for the count row —
    * 6-dp rounded after the exact integer sum (see the block comment).
    * This is the entire corpus-sized cost of whitening; the oracle
    * replays the lift, the row-local pair fan-out, and the exact sums. */
  def whitenMomentsDocs(spark: SparkSession, dir: String): DataFrame = {
    val sums = embedMomentSums(
      Tables.load(spark, dir, "embeddings").select("vec_id", "embedding"))
      .localCheckpoint() // bounded (d(d+1)/2 + d + 1 rows); read twice below
    val nRow = sums.filter(col("l") === -1 && col("m") === -1)
      .select(col("s").cast("double").as("__n"))
    sums.crossJoin(broadcast(nRow)) // 1-row side — bounded by construction
      .select(col("l"), col("m"),
        round(
          when(col("l") === -1, col("s").cast("double"))
            .when(col("m") === -1,
              col("s").cast("double") / col("__n") / 1e6)
            .otherwise(col("s").cast("double") / col("__n") / 1e12),
          6).as("v"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric d×d matrix (driver-side;
    * d is a model constant, never data-sized). Returns (eigenvalues,
    * eigenvector columns U) with A = U diag(λ) Uᵀ. Deterministic: fixed
    * sweep order, fixed convergence threshold. */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val u = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > tol) {
          // symmetric Schur rotation (Golub & Van Loan, Alg. 8.4.1):
          // the (c, s) that exactly zeroes a(p)(q) under Jᵀ A J
          val tau = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t =
            if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
            else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
          val c = 1.0 / math.sqrt(1.0 + t * t); val s = t * c
          val app = a(p)(p); val aqq = a(q)(q); val apq = a(p)(q)
          for (i <- 0 until d) if (i != p && i != q) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
            a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
          }
          a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
          a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
          a(p)(q) = 0.0; a(q)(p) = 0.0
          for (i <- 0 until d) {
            val uip = u(i)(p); val uiq = u(i)(q)
            u(i)(p) = c * uip - s * uiq
            u(i)(q) = s * uip + c * uiq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), u)
  }

  /** ZCA-whiten an embedding column: one exact moment pass (collected —
    * d(d+1)/2 + d + 1 bounded rows, never data-sized), the d×d Jacobi
    * eigensolve, then the row-local affine transform white_j =
    * Σ_l W[j][l]·x_l − (Wμ)_j with W = U diag(1/√(max(λ,0)+eps)) Uᵀ
    * baked in as plan literals (the rpProject discipline — zero
    * shuffles, zero joins at any corpus size). `eps` floors degenerate
    * (zero-variance) directions so constant lanes whiten to 0 instead
    * of NaN. Output (vec_id, lane, v), 6-dp rounded. */
  def whitenEmbeddings(emb: DataFrame, eps: Double = 1e-6): DataFrame = {
    val (w, shift) = whitener(emb, eps)
    whitenWith(emb, w, shift)
  }

  /** Land-or-load the corpus WHITENER (the d-row (j, shift, w) relation —
    * W's rows plus the −Wμ shift): the whitener is a pure deterministic
    * function of the exact integer moments, so landing changes no answer
    * (landed ≡ direct, spec-pinned) and the steady serve whitens
    * arrivals/corpus WITHOUT re-paying the corpus moment pass — the same
    * per-corpus-snapshot artifact class as the landed centroids and the
    * hier index. d rows with d-lane arrays: metadata-scale. Landed
    * through [[graft.sources.Landing.ensureLanded]] (stage + atomic
    * rename + register-last, durable state root) like every other
    * landed artifact. */
  def ensureWhitener(spark: SparkSession, prefix: String,
      emb: => DataFrame, eps: Double = 1e-6): (Array[Array[Double]], Array[Double]) = {
    val table = s"${prefix}_whiten"
    graft.sources.Landing.ensureLanded(spark, table, Seq(table)) { path =>
      val (w, shift) = whitener(emb, eps)
      import spark.implicits._
      w.zipWithIndex.map { case (row, j) => (j.toLong, shift(j), row.toSeq) }
        .toSeq.toDF("j", "shift", "w")
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .option("path", s"$path/whiten").saveAsTable(table)
    }
    val rows = spark.table(table).orderBy("j").collect() // d rows — bounded
    val w = rows.map(_.getSeq[Double](2).toArray)
    val shift = rows.map(_.getDouble(1))
    (w, shift)
  }

  /** Steady whiten serve: transform under the LANDED whitener — the
    * timed plan is the pure scan-side projection, no moment pass. */
  def whitenEmbeddingsSteady(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (w, shift) = ensureWhitener(spark, quantizerPrefix(dir), emb)
    whitenWith(emb, w, shift)
  }

  /** The row-local transform half: white_j = Σ_l W[j][l]·x_l − shift_j
    * with the matrix baked in as plan literals (zero shuffles/joins).
    * Lanes go through the SAME 6-dp round the moment pass lifted — the
    * whitener's μ/C describe the rounded values, and transforming raw
    * floats instead would amplify the raw-vs-rounded gap by 1/√eps
    * along near-null directions (a constant lane would read ~1e-5, not
    * the exact 0 the degenerate-lane law pins). */
  def whitenWith(emb: DataFrame, w: Array[Array[Double]],
      shift: Array[Double]): DataFrame = {
    val r6 = transform(col("embedding"), x => round(x.cast("double"), 6))
    emb.select(col("vec_id"), posexplode(array(
      w.indices.map(j =>
        round(litDot(r6, w(j)) - lit(shift(j)), 6)): _*)))
      .toDF("vec_id", "lane", "v")
      .select(col("vec_id"), col("lane").cast("long").as("lane"), col("v"))
  }

  /** The moment-collect + eigensolve half: (W, shift = Wμ). */
  def whitener(emb: DataFrame,
      eps: Double = 1e-6): (Array[Array[Double]], Array[Double]) = {
    val rows = embedMomentSums(emb).collect()
    var n = 0.0
    val firsts = scala.collection.mutable.Map.empty[Int, BigDecimal]
    val seconds = scala.collection.mutable.Map.empty[(Int, Int), BigDecimal]
    rows.foreach { r =>
      val l = r.getLong(0).toInt; val m = r.getLong(1).toInt
      val s = BigDecimal(r.getDecimal(2))
      if (l == -1 && m == -1) n = s.toDouble
      else if (m == -1) firsts(l) = s
      else seconds((l, m)) = s
    }
    val d = firsts.size
    require(d > 0 && n > 0, "whitening needs a nonempty corpus")
    val mu = Array.tabulate(d)(l => firsts(l).toDouble / n / 1e6)
    val cov = Array.tabulate(d, d) { (l, m) =>
      val s = seconds(if (l <= m) (l, m) else (m, l))
      s.toDouble / n / 1e12 - mu(l) * mu(m)
    }
    val (lam, u) = jacobiEigen(cov)
    val w = Array.tabulate(d, d) { (j, l) =>
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += u(j)(i) * u(l)(i) / math.sqrt(math.max(lam(i), 0.0) + eps)
        i += 1
      }
      acc
    }
    val shift = Array.tabulate(d)(j =>
      (0 until d).map(l => w(j)(l) * mu(l)).sum)
    (w, shift)
  }

  def topKCosineLsh(emb: DataFrame, isQuery: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val banded = hyperplaneBands(emb)
    val qBanded = banded.filter(isQuery)
      .select(col("band"), col("bucket"),
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // Score BEFORE deduplicating band collisions: a (query, vector) pair
    // that collides in several bands scores identically each time, so the
    // dedup is a (query_id, vec_id) max — and the operator's only big
    // exchange then carries 24-byte (query_id, vec_id, score) rows instead
    // of two full embedding vectors (~40× narrower at dim 64).
    val scored = banded.join(qBanded, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
      .groupBy("query_id", "vec_id")
      .agg(max(col("score")).as("score"))
    topKCut(scored, k)
  }

  /** MULTI-PROBE LSH search (Lv et al., VLDB 2007 — public): a near
    * neighbor that disagrees with the query on ONE sign bit of a band
    * misses that band's bucket, so each query additionally probes every
    * bucket at Hamming distance 1 — recall rises the way it would with
    * more hash tables, but from the SAME index (the published
    * memory/recall trade; the distance-1 ring is the dominant
    * perturbation term in the success-probability expansion, probed
    * here exhaustively since a band is only `bitsPerBand` bits wide).
    *
    * Scale shape: identical to [[topKCosineLsh]] — the corpus side is
    * banded once and never re-hashed; only the QUERY side fans out
    * (1 + bitsPerBand)× before the bucket equi-join, and the query set
    * is bounded by contract. Candidate count grows with the probed
    * buckets' occupancy, the dial's documented cost. Same
    * score-then-max-dedup discipline: the big exchange carries 24-byte
    * scored pairs, never vectors. The candidate set is a SUPERSET of
    * the single-probe search's (self bucket = the XOR-0 probe), so
    * recall at k never drops (spec-pinned). */
  def topKCosineLshMp(emb: DataFrame, isQuery: org.apache.spark.sql.Column,
      k: Int, bitsPerBand: Int = 4): DataFrame = {
    val banded = hyperplaneBands(emb)
    val qProbes = banded.filter(isQuery)
      .select(col("band"), col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        explode(array((lit(0L) +: (0 until bitsPerBand).map(i => lit(1L << i)))
          .map(m => col("bucket").bitwiseXOR(m)): _*)).as("bucket"))
    val scored = banded.join(qProbes, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        GraftFunctions.cosineSim(col("q_emb"), col("embedding")).as("score"))
      .groupBy("query_id", "vec_id")
      .agg(max(col("score")).as("score"))
    topKCut(scored, k)
  }

  /** CORRECTNESS instantiation: the [[defaultProbeIds]] queries under
    * the same seeded hyperplanes as `sim_topk_ann`, distance-1 probing.
    * (No default k here — Scala forbids defaults on two overloads.) */
  def topKCosineLshMp(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    topKCosineLshMp(emb, col("vec_id").isin(defaultProbeIds: _*), k)
  }

  // --------------------------------------------------------------------
  // √N-SIZED coarse quantizer — the production IVF sizing rule
  // demonstrated, not just asserted: the fixed-initEvery trainer above
  // grows |cells| ∝ N (constant ~29-vector lists, but the probe argmax
  // scores |Q|·|cells| centroids and the bucketed layout's FIXED fan-out
  // caps pruning at nprobe/16 of a linearly-growing table), while the
  // textbook balance point (Jégou et al., TPAMI 2011 §V: |cells| = O(√N)
  // equalizes the probe-selection and list-scan terms) holds BOTH
  // per-query terms at O(√N): nprobe fixed ⇒ probed-list reads
  // ∝ N/|cells| = √N, centroid scoring ∝ |cells| = √N. The serve plan is
  // UNCHANGED ([[searchIvfPqIndex]]/[[refinedSearchIndex]] verbatim) —
  // only the sizing and the landed layout's fan-out move with the corpus.
  // --------------------------------------------------------------------

  /** The √N sizing, as the trainer's init stride: every `round(√N)`-th
    * vector seeds a cell, giving ≈ √N seeds (and, on this corpus, ≈ √N
    * trained cells — Lloyd's drops only emptied cells). Deterministic
    * from the corpus count and reproduced verbatim by the oracle's
    * `round(sqrt(count(*)))` scalar subquery — Java's half-up round and
    * DuckDB's half-away agree on positives. */
  def scaledInitEvery(n: Long): Int =
    math.max(2L, math.round(math.sqrt(n.toDouble))).toInt

  /** Catalog prefix for the √N-sized artifacts — a separate family from
    * [[quantizerPrefix]]'s fixed-sizing one (both are legitimate dials;
    * the spec compares them). */
  def quantizerPrefixScaled(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"ivfpq_quant_scaled_$suffix"
  }

  /** Train and land the √N-cell coarse centroids. The PQ codebook is
    * deliberately SHARED with the fixed-sizing family
    * ([[loadLandedQuantizers]]'s `_codebook`): subspace quantization is
    * independent of the coarse partition, so re-sizing the IVF never
    * retrains PQ — exactly the production re-shard path (re-cluster +
    * re-assign, codes unchanged per vector). */
  def landQuantizersScaled(spark: SparkSession, dir: String, path: String): Unit = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    kmeansCentroids(emb, initEvery = scaledInitEvery(emb.count()))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/centroids")
      .saveAsTable(s"${quantizerPrefixScaled(dir)}_centroids")
  }

  /** The √N-sized quantizer pair: scaled centroids (landing them on
    * first use) + the shared landed PQ book. */
  def loadLandedQuantizersScaled(spark: SparkSession, dir: String): (DataFrame, Seq[(Int, Int, Array[Double])]) = {
    val prefix = quantizerPrefixScaled(dir)
    graft.sources.Landing.ensureLanded(spark, s"${prefix}_quant",
      Seq(s"${prefix}_centroids")) { path =>
      landQuantizersScaled(spark, dir, path)
    }
    (spark.table(s"${prefix}_centroids"), loadLandedQuantizers(spark, dir)._2)
  }

  /** Land the √N-sized inverted code list, bucketed by `cell_id` with
    * the fan-out GROWN WITH THE CELL COUNT (one bucket per trained cell
    * here — ~√N buckets), so `cell_id IN (probed)` prunes to nprobe
    * buckets of ~√N code rows each: per-query physical reads ∝ √N where
    * the fixed-16-bucket layout reads nprobe/16 of a table ∝ N.
    *
    * Layout choice at production cell counts (PLANS.md round-12 note):
    * thousands-to-millions of cells do NOT mean that many buckets — cap
    * the fan-out at table-size/128–256 MiB ([[graft.sources.Layout]]'s
    * rule) and let consecutive cells share a bucket; pruning granularity
    * stays the bucket, so per-query reads become
    * nprobe · cellsPerBucket · listLen — still ∝ √N for any FIXED
    * cells-per-bucket, without the small-file pathology a
    * bucket-per-cell (or `partitionBy("cell_id")`) layout hits when
    * cells ≫ files-worth-of-data. `maxBuckets` models the cap; the test
    * corpora sit below it, so the demo lands one cell per bucket. */
  def landIvfPqCodesScaled(spark: SparkSession, dir: String, path: String,
      m: Int = 8, subDim: Int = 8, maxBuckets: Int = 256): Unit = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizersScaled(spark, dir)
    val buckets = math.min(centDf.count(), maxBuckets.toLong).toInt
    graft.sources.Layout.writeBucketed(
      ivfPqIndexRows(emb, m, subDim, centDf, book),
      s"${quantizerPrefixScaled(dir)}_codes", Seq("cell_id"),
      Seq("cell_id", "vec_id", "sub"), buckets, s"$path/codes")
  }

  /** Ensure the √N-sized code list is landed and return it. */
  def ensureIvfPqCodesScaled(spark: SparkSession, dir: String): DataFrame = {
    val table = s"${quantizerPrefixScaled(dir)}_codes"
    graft.sources.Landing.ensureLanded(spark, table, Seq(table)) { path =>
      landIvfPqCodesScaled(spark, dir, path)
    }
    spark.table(table)
  }

  /** IVF-PQ serve off the √N-sized landed artifacts —
    * [[topKPqIvfLanded]]'s plan verbatim (bucket-pruned candidate scan,
    * broadcast probes/LUT, partial-merge ADC), only the quantizer sizing
    * and bucket fan-out differ. The entry whose sf0.1→sf1 bench row
    * demonstrates the flat(ish) serve the fixed sizing can't give. */
  def topKPqIvfLandedScaled(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizersScaled(spark, dir)
    searchIvfPqIndex(ensureIvfPqCodesScaled(spark, dir), defaultQueries(emb),
      k, nprobe = 4, m = 8, subDim = 8, centDf, book)
  }

  /** Two-stage refined serve off the √N-sized landed artifacts —
    * [[topKPqIvfRefinedLanded]] with the scaled sizing: the wide ADC cut
    * reads nprobe ≈ √N-row inverted lists, the exact re-rank touches
    * |Q|·r·k full vectors. The production read path at the production
    * sizing. */
  def topKPqIvfRefinedLandedScaled(spark: SparkSession, dir: String,
      k: Int = 5, r: Int = 4): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val (centDf, book) = loadLandedQuantizersScaled(spark, dir)
    refinedSearchIndex(emb, ensureIvfPqCodesScaled(spark, dir),
      defaultQueries(emb), k, r, nprobe = 4, m = 8, subDim = 8, centDf, book)
  }
}
