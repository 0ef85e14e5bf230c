package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight loops shared by interpreted `eval` and generated Java code.
  *
  * Each method is a static call on primitive Catalyst containers
  * (`ArrayData`, `UTF8String`) so whole-stage codegen can invoke it without
  * converting to Scala collections — the expression stays inside the
  * codegen'd stage and never pays the UDF SerDe tax. At 100 TB these loops
  * run once per row, so they avoid allocation wherever possible.
  */
object VectorKernels {
  /** Cosine similarity of two float vectors, accumulated in double.
    * Zero-norm input yields NaN (same as dot/(0*n)) — callers filter. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Plain dot product of two float vectors in double precision. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Spark SQL's double comparison semantics (SQLOrderingUtil): IEEE
    * equality first (so -0.0 == 0.0), else `Double.compare` (so NaN is
    * GREATER than every non-NaN and equal to itself) — the exact total
    * order `max_by(_, struct(cs, …))` aggregates under. Replicated here
    * so the scan-side argmax below is bit-equivalent to the aggregate
    * form it replaces. */
  private def cmpDouble(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Scan-side nearest-centroid argmax — the zero-shuffle replacement
    * for `crossJoin(broadcast(centroids)) → groupBy(id).agg(max_by(cell,
    * struct(cs, -cell)))`: per row, score every centroid with the SAME
    * double-accumulated cosine as [[cosine]] (identical loop order, so
    * identical doubles) and keep the best under the SAME total order
    * (cosine DESC with Spark's NaN-greatest double semantics, ties to
    * the SMALLER cell id). The aggregate form shuffles one row per
    * corpus vector — embedding payload included — per assignment; this
    * form emits the winning cell id in the scan stage and shuffles
    * nothing. Centroids arrive as plain arrays (collected by the caller
    * — the same driver/executor byte budget the broadcast already paid,
    * since a broadcast relation is collected to the driver first). */
  def nearestCell(e: ArrayData, ids: Array[Long],
      cents: Array[Array[Float]]): Long = {
    val ne = e.numElements()
    var bestId = 0L
    var bestCs = 0.0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(ne, c.length)
      var dotv = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = e.getFloat(i).toDouble
        val y = c(i).toDouble
        dotv += x * y; na += x * x; nb += y * y
        i += 1
      }
      val cs = dotv / math.sqrt(na * nb)
      val cmp = if (j == 0) 1 else cmpDouble(cs, bestCs)
      if (cmp > 0 || (cmp == 0 && ids(j) < bestId)) {
        bestCs = cs; bestId = ids(j)
      }
      j += 1
    }
    bestId
  }

  /** [[nearestCell]] over a ROW-CARRIED member array — the stage-2 argmax
    * of the two-level assignment evaluated scan-side: `members` is an
    * array of (cell_id bigint, c_emb array<float>) structs (one coarse
    * group's member centroids, pre-grouped once per centroid set), and
    * the result is the member id maximizing (cosine, then SMALLER id)
    * under the same total order as [[nearestCell]] / the
    * `max_by(cell, struct(cs, -cell))` aggregate this replaces. The
    * comparison is a total order, so the result is independent of member
    * order (collect_list order is partitioning-dependent). Null member
    * embeddings replicate the aggregate's null-ordering: a null cosine
    * sorts below every value (NaN included), ties among nulls to the
    * smaller id. */
  def nearestCellIn(e: ArrayData, members: ArrayData): Long = {
    val ne = e.numElements()
    val nm = members.numElements()
    var bestId = 0L
    var bestCs = 0.0
    var bestNull = true
    var first = true
    var j = 0
    while (j < nm) {
      val row = members.getStruct(j, 2)
      val id = row.getLong(0)
      if (row.isNullAt(1)) {
        if (first || (bestNull && id < bestId)) { bestId = id; first = false }
      } else {
        val c = row.getArray(1)
        val n = math.min(ne, c.numElements())
        var dotv = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = e.getFloat(i).toDouble
          val y = c.getFloat(i).toDouble
          dotv += x * y; na += x * x; nb += y * y
          i += 1
        }
        val cs = dotv / math.sqrt(na * nb)
        val cmp = if (first || bestNull) 1 else cmpDouble(cs, bestCs)
        if (cmp > 0 || (cmp == 0 && id < bestId)) {
          bestCs = cs; bestId = id; bestNull = false; first = false
        }
      }
      j += 1
    }
    bestId
  }

  /** One PQ subspace's argmin code — the kernel behind
    * [[graft.functions.PqEncodeCodes]] / [[graft.functions.PqAssignCell]],
    * bit-equivalent to the literal-tree spelling it replaces
    * (`array_min` over `struct(‖c‖² − 2·e_s·c, cell)` candidates built
    * from plan literals): the dot is the same left-to-right double fold
    * as `aggregate(zip_with(...))`, ‖c‖² arrives precomputed by the SAME
    * Scala `.sum` fold, comparison is SQL double ordering (d ASC
    * nulls-excluded-by-construction, NaN greatest), ties to the SMALLER
    * cell id. Short or null-holed slices replicate Spark's
    * null-propagation exactly: `zip_with` pads a short slice with nulls,
    * nulling the dot — and therefore d — for EVERY cell of the subspace,
    * and a null-d struct sorts FIRST in array_min with ties to the
    * smaller cell, so the argmin degenerates to the smallest cell id
    * (`ids` arrive sorted ascending). */
  def pqCell(e: ArrayData, isDouble: Boolean, off: Int, subDim: Int,
      ids: Array[Long], cents: Array[Array[Double]],
      sumSq: Array[Double]): Long = {
    val ne = e.numElements()
    if (ne < off + subDim) return ids(0)
    var i = 0
    while (i < subDim) { if (e.isNullAt(off + i)) return ids(0); i += 1 }
    var bestId = 0L; var bestD = 0.0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0.0
      var j = 0
      while (j < subDim) {
        val x = if (isDouble) e.getDouble(off + j)
                else e.getFloat(off + j).toDouble
        dot += x * cv(j)
        j += 1
      }
      val d = sumSq(c) - 2.0 * dot
      val cmp = if (c == 0) -1 else cmpDouble(d, bestD)
      if (cmp < 0 || (cmp == 0 && ids(c) < bestId)) { bestD = d; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** All m PQ subspace codes of one vector in one call (see [[pqCell]]). */
  def pqCodes(e: ArrayData, isDouble: Boolean, subDim: Int,
      ids: Array[Array[Long]], cents: Array[Array[Array[Double]]],
      sumSq: Array[Array[Double]]): ArrayData = {
    val m = ids.length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      out(s) = pqCell(e, isDouble, s * subDim, subDim, ids(s), cents(s), sumSq(s))
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object HashKernels {
  /** SplitMix64 — deterministic stream of well-mixed 64-bit constants. */
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature: k permutations h_j(x) = a_j*x + b_j over the input
    * hash set, taking the min of each. a_j forced odd so the multiply is a
    * bijection on Z/2^64. Empty input yields Long.MaxValue sentinels.
    *
    * This is the signature stage of the banded-LSH dedup (SURVEY §7.3):
    * computed row-at-a-time, no state, so it scales embarrassingly — the
    * only shuffle in the dedup pipeline is the later band-bucket join. */
  def minhash(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val out = new Array[Long](k)
    val n = hashes.numElements()
    var j = 0
    while (j < k) {
      val a = splitmix64(seed + 2L * j) | 1L
      val b = splitmix64(seed + 2L * j + 1L)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = a * hashes.getLong(i) + b
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash over pre-hashed tokens: per bit, +1 if set else -1,
    * summed over tokens; output bit = sign of the sum. Near-duplicate docs
    * land within a small Hamming distance. */
  def simhash(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object TextKernels {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.unsafe.Platform

  /** Single-pass n-gram shingle hashes: ASCII-lowercase tokenize
    * ([a-z0-9]+ runs, everything else — including non-ASCII bytes — is a
    * separator), XXH64 each token, XXH64-chain each n-token window.
    * Shorter-than-n inputs produce one whole-sequence shingle; zero tokens
    * produce one sentinel shingle (documents never vanish from the set).
    *
    * Exists because the higher-order-function formulation
    * (transform + lambda over the token array) re-evaluates outer
    * expressions per window in interpreted mode — O(tokens · windows)
    * with per-window allocation, measured 7-26× slower at sf0.1. This
    * kernel is O(bytes + tokens·n), allocation-free per window, and stays
    * inside whole-stage codegen like every other kernel here. */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): ArrayData = {
    val nb = s.numBytes()
    var tok = new Array[Long](16)
    var t = 0
    val scratch = new Array[Byte](math.max(nb, 1))
    var i = 0
    while (i < nb) {
      var c = s.getByte(i) & 0xFF
      if (c >= 'A' && c <= 'Z') c += 32
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var len = 0
        var run = true
        while (run && i < nb) {
          var cc = s.getByte(i) & 0xFF
          if (cc >= 'A' && cc <= 'Z') cc += 32
          if ((cc >= 'a' && cc <= 'z') || (cc >= '0' && cc <= '9')) {
            scratch(len) = cc.toByte; len += 1; i += 1
          } else run = false
        }
        if (t == tok.length) tok = java.util.Arrays.copyOf(tok, t * 2)
        tok(t) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, seed)
        t += 1
      } else i += 1
    }
    val wins = math.max(t - (n - 1), 1)
    val out = new Array[Long](wins)
    var w = 0
    while (w < wins) {
      var h = seed
      var j = 0
      while (j < n && w + j < t) { h = XXH64.hashLong(tok(w + j), h); j += 1 }
      out(w) = h
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Fingerprint modulus: the classic 1e9+7 prime. Small enough that
    * (acc*31 + byte) never overflows a long, large enough that the
    * ~500-word corpus has no realistic collision. */
  val Mod: Long = 1000000007L
  val Base: Long = 31L

  /** Whole-document polynomial fingerprint over UTF-8 bytes:
    * fold(acc = 7; acc = (acc*31 + byte) mod 1e9+7). Single pass, zero
    * allocation — the codegen'd scan-side form of DuckDB's
    * `list_reduce(list_prepend(7, codes), …)` oracle (bytes == codepoints
    * on the ASCII corpus). */
  def polyFingerprint(s: UTF8String): Long = {
    val n = s.numBytes()
    var acc = 7L
    var i = 0
    while (i < n) {
      acc = (acc * Base + (s.getByte(i) & 0xFF)) % Mod
      i += 1
    }
    acc
  }

  /** Minimum rolling k-gram hash — a true Rabin-Karp rolling window: each
    * step removes the outgoing byte's contribution (precomputed 31^(k-1)
    * mod p) and admits the incoming byte — O(n) total instead of the
    * O(n·k) of hashing every window independently. The window hash is the
    * init-0 polynomial `sum(byte_j · 31^(k-1-j)) mod p`, which is exactly
    * what DuckDB's `list_reduce(codes, (acc,x) -> acc*31+x)` computes, so
    * the oracle recomputes each window independently and must agree.
    * The min over all windows is a winnowing-style document fingerprint.
    * Inputs shorter than k hash as one whole-string window. */
  def rollingMinHash(s: UTF8String, k: Int): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    if (n <= k) {
      while (i < n) { h = (h * Base + (s.getByte(i) & 0xFF)) % Mod; i += 1 }
      return h
    }
    var pw = 1L // 31^(k-1) mod p
    i = 1
    while (i < k) { pw = (pw * Base) % Mod; i += 1 }
    i = 0
    while (i < k) { h = (h * Base + (s.getByte(i) & 0xFF)) % Mod; i += 1 }
    var min = h
    i = k
    while (i < n) {
      val outgoing = ((s.getByte(i - k) & 0xFF) * pw) % Mod
      h = ((h - outgoing + Mod) % Mod * Base + (s.getByte(i) & 0xFF)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Feature-hashing lane counts: ASCII-lowercase tokenize (the
    * [[shingleHashes]] stance — [a-z0-9]+ runs, everything else a
    * separator), md5 each token, first 32 md5 bits mod `dims` picks the
    * lane, return the per-lane count array. One pass over the bytes,
    * one md5 per token, no per-lane re-hash and no interpreted lambda
    * anywhere — the codegen'd scan-side form of the
    * `md5Prefix32(token) % dims` HOF spelling (bit-identical: md5 over
    * the token's lowercased ASCII bytes ≡ md5(lower(token)) on this
    * tokenizer's output, and the unsigned 32-bit prefix ≡
    * conv(substr(hex,1,8),16,10)). Measured 2.5× over the staged HOF
    * chain at sf0.1 — and unlike the HOF form it cannot be silently
    * re-evaluated by expression-cloning rules (InferFiltersFromGenerate
    * class): the whole cost is one kernel call per row.
    *
    * CONTRACT: ASCII corpora (TESTDATA's). Lowercasing is ASCII-only and
    * every non-ASCII byte is a separator, which diverges from Unicode
    * lowercasing (Spark `lower()`/`tokens()`, the SQL oracles) on the
    * rare codepoints whose Unicode lowercase lands inside [a-z0-9]
    * (U+212A KELVIN SIGN → 'k', U+0130 → 'i'+dot). KernelProps pins the
    * off-contract behavior so the divergence class is tested, not
    * latent. */
  def hashLaneCounts(s: UTF8String, dims: Int): ArrayData = {
    val nb = s.numBytes()
    val counts = new Array[Long](dims)
    val scratch = new Array[Byte](math.max(nb, 1))
    val md = md5Local.get()
    var i = 0
    while (i < nb) {
      var c = s.getByte(i) & 0xFF
      if (c >= 'A' && c <= 'Z') c += 32
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var len = 0
        var run = true
        while (run && i < nb) {
          var cc = s.getByte(i) & 0xFF
          if (cc >= 'A' && cc <= 'Z') cc += 32
          if ((cc >= 'a' && cc <= 'z') || (cc >= '0' && cc <= '9')) {
            scratch(len) = cc.toByte; len += 1; i += 1
          } else run = false
        }
        md.reset()
        md.update(scratch, 0, len)
        val d = md.digest()
        val lane = (((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)) % dims
        counts(lane.toInt) += 1
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  /** Shannon entropy (nats) of the string's BYTE distribution: one pass
    * for the 256-bucket histogram, one fixed-size pass for −Σ p·ln p.
    * O(bytes + 256) per row, allocation = one int[256]; empty input is
    * 0.0. Byte-level deliberately — it needs no tokenizer, catches
    * repeated-character padding AND random/binary junk, and on the ASCII
    * corpus bytes ≡ codepoints so the SQL oracle can recompute it
    * character-wise. */
  def byteEntropy(s: UTF8String): Double = {
    val n = s.numBytes()
    if (n == 0) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(s.getByte(i) & 0xFF) += 1; i += 1 }
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) { val p = c.toDouble / n; h -= p * math.log(p) }
      b += 1
    }
    h
  }
}

object HexKernels {
  /** Hex string → decimal string with arbitrary precision.
    *
    * Exact parity with the reference's `encrypt_zip`
    * (dags/producer/kafka_streaming_service.py:142-146): Python's
    * `int(md5_hex, 16)` is a 128-bit value, so Spark's built-in
    * `conv(hex, 16, 10)` (64-bit, wraps) is NOT equivalent — this is the
    * parity trap flagged in SURVEY §7.4.1. Returns null on non-hex input. */
  def hexToDec(s: UTF8String): UTF8String = {
    try UTF8String.fromString(new java.math.BigInteger(s.toString.trim, 16).toString)
    catch { case _: NumberFormatException => null }
  }
}

object TextNormKernels {
  /** Unicode NFC normalization (canonical compose) — the
    * normalize-before-hash step every dedup/fingerprint pipeline needs:
    * "café" spelled e+COMBINING ACUTE and é are DIFFERENT byte strings
    * (different MD5s, shingles, MinHash signatures) but the SAME text.
    * Fast path: `isNormalized` is a scan without allocation, and real
    * corpora are overwhelmingly already-NFC, so the common case returns
    * the input UTF8String untouched. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object ZOrderKernels {
  /** Spread the 32 bits of `x` (taken unsigned) to the even bit positions
    * of a long — the classic Morton-code magic-mask ladder. */
  def spreadBits(x: Int): Long = {
    var v = x.toLong & 0xffffffffL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** Z-value (Morton interleave) of two ints, as a SIGNED-comparable long:
    * each input is sign-flipped so its unsigned bit order equals its
    * signed value order, and the interleaved result is sign-flipped back
    * so an ORDER BY / range partition on the long walks the Z-curve. `a`
    * occupies the even bits (less significant at equal depth), `b` the
    * odd. */
  def zInterleave(a: Int, b: Int): Long =
    (spreadBits(a ^ Int.MinValue) | (spreadBits(b ^ Int.MinValue) << 1)) ^ Long.MinValue
}

object MediaKernels {
  /** Perceptual-signature geometry: 64 sign-projection bits over a
    * 256-bucket hashed byte-bigram histogram, packed as 4 × 16-bit band
    * values (packing per band, not one 64-bit long, keeps bit 63 out of
    * the signed-shift overflow zone on both engines). */
  val PhashBits = 64
  val PhashDims = 256
  val PhashBands = 4
  val PhashSeed = 11L

  /** Seeded ±1 sign matrix (the rpSigns construction —
    * java.util.Random(seed) booleans in row-major order). Public so the
    * oracle embeds the SAME signs as SQL literals. */
  lazy val phashSigns: Array[Array[Int]] = {
    val rnd = new java.util.Random(PhashSeed)
    Array.fill(PhashBits, PhashDims)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** Perceptual signature of an opaque binary payload: hashed-bigram
    * histogram (bucket = (b₁·31 + b₂) mod 256 over consecutive byte
    * pairs) sign-projected to 64 bits — a content signature that is
    * STABLE under small payload edits (an appended tail moves a handful
    * of histogram counts, so only low-|projection| bits can flip) yet
    * discriminative across unrelated payloads (projections of distinct
    * sparse histograms sign-flip independently). All-integer arithmetic
    * — no float drift anywhere. Payloads with fewer than 2 bytes have
    * no bigrams; callers filter them (no-content contract). */
  def phashBands(payload: Array[Byte]): ArrayData = {
    val hist = new Array[Long](PhashDims)
    var i = 0
    while (i < payload.length - 1) {
      val b1 = payload(i) & 0xff
      val b2 = payload(i + 1) & 0xff
      hist((b1 * 31 + b2) % PhashDims) += 1L
      i += 1
    }
    val out = new Array[Long](PhashBands)
    var bit = 0
    while (bit < PhashBits) {
      val row = phashSigns(bit)
      var proj = 0L
      var v = 0
      while (v < PhashDims) { proj += hist(v) * row(v); v += 1 }
      if (proj > 0) out(bit >>> 4) |= (1L << (bit & 15))
      bit += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
