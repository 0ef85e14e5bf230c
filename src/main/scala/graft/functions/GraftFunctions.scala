package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Column-level API + SQL registration for the custom expressions.
  *
  * Registered through [[GraftExtensions]] (the public
  * `SparkSessionExtensions.injectFunction` hook) so the same functions are
  * reachable from `spark.sql("… cosine_sim(a,b) …")` and from the typed
  * Column helpers below.
  */
object GraftFunctions {

  private def col(e: Expression): Column = Bridge.column(e)
  private def expr(c: Column): Expression = Bridge.expression(c)

  /** Arbitrary-precision hex→decimal string (MD5 pseudonym building block). */
  def hexToDec(c: Column): Column = col(HexToDecimal(expr(c)))

  /** Unicode NFC normalization (normalize-before-hash). */
  def nfcNorm(c: Column): Column = col(NfcNormalize(expr(c)))

  /** Reference `encrypt_zip` parity: decimal string of the 128-bit MD5.
    * (dags/producer/kafka_streaming_service.py:142-146) */
  def md5Pseudonym(c: Column): Column = {
    import org.apache.spark.sql.functions.md5
    hexToDec(md5(c.cast("string").cast("binary")))
  }

  def cosineSim(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))
  /** Scan-side nearest-centroid argmax over a collected centroid set
    * (see [[NearestCellId]] — the zero-shuffle assignment primitive). */
  def nearestCell(e: Column, ids: Array[Long], cents: Array[Array[Float]]): Column =
    col(NearestCellId(expr(e), ids, cents))
  /** Stage-2 scan-side argmax over a row-carried member array (see
    * [[NearestCellIn]]). */
  def nearestCellIn(e: Column, members: Column): Column =
    col(NearestCellIn(expr(e), expr(members)))
  /** All m PQ subspace codes against a reference-object codebook (see
    * [[PqEncodeCodes]]). */
  def pqCodes(e: Column, subDim: Int, ids: Array[Array[Long]],
      cents: Array[Array[Array[Double]]]): Column =
    col(PqEncodeCodes(expr(e), subDim, ids, cents))
  /** One subspace's PQ argmin code for a (sub, subvector) row (see
    * [[PqAssignCell]]). */
  def pqCell(sub: Column, sv: Column, ids: Array[Array[Long]],
      cents: Array[Array[Array[Double]]]): Column =
    col(PqAssignCell(expr(sub), expr(sv), ids, cents))
  def dotF(a: Column, b: Column): Column = col(DotProductF(expr(a), expr(b)))
  def minhashSig(c: Column, k: Int, seed: Long): Column = col(MinHashSig(expr(c), k, seed))
  def simhash64(c: Column): Column = col(SimHash64(expr(c)))
  def docFingerprint(c: Column): Column = col(DocFingerprint(expr(c)))
  def byteEntropy(c: Column): Column = col(ByteEntropy(expr(c)))
  def hashLaneCounts(c: Column, dims: Int): Column = col(HashLaneCounts(expr(c), dims))
  def rollingMinHash(c: Column, k: Int): Column = col(RollingMinHash(expr(c), k))
  def shingleHashes(c: Column, n: Int, seed: Long = 42L): Column =
    col(ShingleHashes(expr(c), n, seed))
  def zOrder2(a: Column, b: Column): Column = col(ZOrder2(expr(a), expr(b)))
  def phashBands(c: Column): Column = col(PhashBands(expr(c)))

  /** Bounded top-k aggregate: k best ids by (score DESC, id ASC) — the
    * map-side-cut replacement for a rank-window top-k (see TopKByScore). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    col(TopKByScore(expr(score), expr(id), k).toAggregateExpression())

  /** Exact integer moment relation in ONE partial-merge buffer (see
    * [[MomentSums]] — the whitening moment pass without the d(d+1)/2
    * row fan-out). */
  def momentSums(mi: Column): Column =
    col(MomentSums(expr(mi)).toAggregateExpression())

  /** First 32 bits of md5(c) as a long — THE deterministic-uniform
    * primitive every hash-draw operator shares (stratified/weighted
    * sampling, temperature mixing, negative-pair drawing). One
    * definition because every site must stay bit-identical to its DuckDB
    * oracle: `conv` is exact at 8 hex chars (its 64-bit wrap trap starts
    * at 16), and a drift in any copy silently breaks cross-engine
    * determinism. */
  def md5Prefix32(c: Column): Column = {
    import org.apache.spark.sql.functions.{conv, md5, substring}
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")
  }

  /** `(md5Prefix32 + 0.5) / 2^32` — a fixed-point uniform in (0, 1),
    * reproducible across runs, engines, and partitionings (unlike
    * `rand()`). */
  def md5Uniform(c: Column): Column =
    (md5Prefix32(c).cast("double") + org.apache.spark.sql.functions.lit(0.5)) / 4294967296.0d

  private def litInt(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$name expects an int literal, got $other")
  }
  private def litLong(e: Expression, name: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _)  => v.toLong
    case other => throw new IllegalArgumentException(s"$name expects a long literal, got $other")
  }

  private def info(name: String, cls: Class[_]): ExpressionInfo =
    new ExpressionInfo(cls.getCanonicalName, name)

  /** (name, info, builder) triples for SparkSessionExtensions.injectFunction. */
  val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("hex_to_dec"), info("hex_to_dec", classOf[HexToDecimal]),
      (es: Seq[Expression]) => HexToDecimal(es.head)),
    (FunctionIdentifier("nfc_norm"), info("nfc_norm", classOf[NfcNormalize]),
      (es: Seq[Expression]) => NfcNormalize(es.head)),
    (FunctionIdentifier("cosine_sim"), info("cosine_sim", classOf[CosineSimilarity]),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("dot_f"), info("dot_f", classOf[DotProductF]),
      (es: Seq[Expression]) => DotProductF(es(0), es(1))),
    (FunctionIdentifier("minhash_sig"), info("minhash_sig", classOf[MinHashSig]),
      (es: Seq[Expression]) => MinHashSig(es(0), litInt(es(1), "minhash_sig k"), litLong(es(2), "minhash_sig seed"))),
    (FunctionIdentifier("simhash64"), info("simhash64", classOf[SimHash64]),
      (es: Seq[Expression]) => SimHash64(es.head)),
    (FunctionIdentifier("doc_fingerprint"), info("doc_fingerprint", classOf[DocFingerprint]),
      (es: Seq[Expression]) => DocFingerprint(es.head)),
    (FunctionIdentifier("byte_entropy"), info("byte_entropy", classOf[ByteEntropy]),
      (es: Seq[Expression]) => ByteEntropy(es.head)),
    (FunctionIdentifier("shingle_hashes"), info("shingle_hashes", classOf[ShingleHashes]),
      (es: Seq[Expression]) => ShingleHashes(es.head, litInt(es(1), "shingle_hashes n"), 42L)),
    (FunctionIdentifier("rolling_min_hash"), info("rolling_min_hash", classOf[RollingMinHash]),
      (es: Seq[Expression]) => RollingMinHash(es.head, litInt(es(1), "rolling_min_hash k"))),
    (FunctionIdentifier("topk_by"), info("topk_by", classOf[TopKByScore]),
      (es: Seq[Expression]) => TopKByScore(es(0), es(1), litInt(es(2), "topk_by k"))),
    (FunctionIdentifier("z_order2"), info("z_order2", classOf[ZOrder2]),
      (es: Seq[Expression]) => ZOrder2(es(0), es(1))),
    (FunctionIdentifier("hash_lane_counts"), info("hash_lane_counts", classOf[HashLaneCounts]),
      (es: Seq[Expression]) => HashLaneCounts(es.head, litInt(es(1), "hash_lane_counts dims"))),
    (FunctionIdentifier("phash_bands"), info("phash_bands", classOf[PhashBands]),
      (es: Seq[Expression]) => PhashBands(es.head)),
  )
}

/** Install with `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach(ext.injectFunction)
    // keyless range joins → bucketed equi-joins (inert until
    // spark.graft.rangeJoin.binSize is set; see RangeJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // plans the TopKPerKey logical node (bounded-heap per-key top-k;
    // matches nothing else, so it is inert for ordinary plans)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // key-only filters commute with per-key top-k → relocate below the
    // node so the fixed-point batch pushes them into the scan
    ext.injectOptimizerRule(_ => graft.plans.TopKFilterPushdown)
  }
}
