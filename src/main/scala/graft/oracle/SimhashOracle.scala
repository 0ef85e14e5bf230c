package graft.oracle

/** Generated DuckDB oracle for the SimHash near-dup pipeline: Spark's
  * XXH64 (seed 42) re-emitted as u64-emulated HUGEINT SQL, so the oracle
  * recomputes the exact shingle hashes → window chains → simhash64
  * fingerprints → all-pairs Hamming ground truth that the banded Spark
  * plan must equal (pigeonhole recall is exact for Hamming ≤ 3 with 4×16
  * bands; verification removes every false positive).
  *
  * u64 emulation: values live in [0, 2^64) as HUGEINT; multiplication
  * wraps via 32-bit limbs (every partial product < 2^65, inside int128);
  * rotations are shift-add on disjoint bit ranges; xor/bit_count are
  * native on HUGEINT. Sub-expressions are let-bound through the
  * `list_transform([e], x -> body)[1]` idiom so the emitted SQL stays
  * linear in the algorithm instead of exponential in textual expansion.
  *
  * Scope: tokens ≥ 32 bytes would need xxHash's 4-lane stripe loop; the
  * corpus tokenizer caps tokens at 8 bytes (measured ≤ 8 at sf0.01/0.1),
  * so the emitter guards that branch with a NULL poison — if the corpus
  * ever grows a ≥32-byte token the gate fails loudly instead of silently
  * hashing wrong.
  */
object SimhashOracle {

  private val U64 = "18446744073709551616::HUGEINT"
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val Seed = BigInt(42)

  private def lit(v: BigInt): String = s"$v::HUGEINT"
  private def pow2(n: Int): BigInt = BigInt(1) << n

  /** Let-binding: evaluate `expr` once, name it `v` inside `body`. */
  private def bind(expr: String, v: String, body: String): String =
    s"list_transform([$expr], $v -> $body)[1]"

  private def mod(e: String): String = s"(($e) % $U64)"

  /** (a·b) mod 2^64 via 32-bit limbs — a and b must be atomic. */
  private def mul(a: String, b: String): String = {
    val lo = "4294967296::HUGEINT"
    mod(s"(($a) % $lo) * (($b) % $lo)" +
      s" + (((($a) // $lo) * (($b) % $lo) + (($a) % $lo) * (($b) // $lo)) % $lo) * $lo")
  }

  /** rotl64 as shift-add on disjoint bit ranges — x must be atomic. */
  private def rotl(x: String, r: Int): String =
    s"((($x) * ${lit(pow2(r))}) % $U64 + (($x) // ${lit(pow2(64 - r))}))"

  private def xor(a: String, b: String): String = s"xor($a, $b)"
  private def shr(x: String, n: Int): String = s"(($x) // ${lit(pow2(n))})"

  private def fmix(h: String): String = {
    val e1 = xor(h, shr(h, 33))
    val e2 = bind(e1, "f1", mul("f1", lit(P2)))
    val e3 = bind(e2, "f2", xor("f2", shr("f2", 29)))
    val e4 = bind(e3, "f3", mul("f3", lit(P3)))
    bind(e4, "f4", xor("f4", shr("f4", 32)))
  }

  /** One 8-byte word round: h ^= rotl31(k·P2)·P1; h = rotl27(h)·P1 + P4. */
  private def wordRound(h: String, k: String): String = {
    val t1 = bind(mul(k, lit(P2)), "w1", bind(rotl("w1", 31), "w2", mul("w2", lit(P1))))
    val t2 = bind(t1, "w3", xor(h, "w3"))
    bind(t2, "w4", bind(rotl("w4", 27), "w5", mod(s"${mul("w5", lit(P1))} + ${lit(P4)}")))
  }

  /** XXH64(bytes of `tok`, seed 42) for tokens < 32 bytes (NULL poison
    * beyond — see scope note). `tok` must be atomic VARCHAR. */
  private def xxh64Short(tok: String): String = {
    val n = s"length($tok)"
    val bs = s"list_transform(range(1, $n + 1), i -> ascii(substr($tok, i::INT, 1))::HUGEINT)"
    val h0 = mod(s"${lit(Seed + P5)} + n")
    val word = "(bs[8*w + 1] + bs[8*w + 2] * 256::HUGEINT + bs[8*w + 3] * 65536::HUGEINT" +
      " + bs[8*w + 4] * 16777216::HUGEINT + bs[8*w + 5] * 4294967296::HUGEINT" +
      " + bs[8*w + 6] * 1099511627776::HUGEINT + bs[8*w + 7] * 281474976710656::HUGEINT" +
      " + bs[8*w + 8] * 72057594037927936::HUGEINT)"
    val words = s"list_transform(range(0, n // 8), w -> $word)"
    val afterWords =
      s"list_reduce(list_prepend($h0, $words), (acc, k) -> ${wordRound("acc", "k")})"
    val k4 = "(bs[8*(n//8) + 1] + bs[8*(n//8) + 2] * 256::HUGEINT" +
      " + bs[8*(n//8) + 3] * 65536::HUGEINT + bs[8*(n//8) + 4] * 16777216::HUGEINT)"
    val after4 = "CASE WHEN n % 8 >= 4 THEN " +
      bind(bind(k4, "k4", mul("k4", lit(P1))), "t4",
        bind(xor("h1", "t4"), "t5",
          bind(rotl("t5", 23), "t6", mod(s"${mul("t6", lit(P2))} + ${lit(P3)}")))) +
      " ELSE h1 END"
    val tailStart = "(8*(n//8) + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END)"
    val tail = s"list_transform(range($tailStart + 1, n + 1), i -> bs[i::INT])"
    val afterBytes = s"list_reduce(list_prepend(h2, $tail), (acc, b) -> " +
      bind(mul("b", lit(P5)), "b1",
        bind(xor("acc", "b1"), "b2",
          bind(rotl("b2", 11), "b3", mul("b3", lit(P1))))) + ")"
    val core = bind(afterWords, "h1", bind(after4, "h2", bind(afterBytes, "h3", fmix("h3"))))
    val full = bind(bs, "bs", core)
    s"CASE WHEN $n >= 32 THEN NULL::HUGEINT ELSE ${bind(n, "n", full)} END"
  }

  /** XXH64 of the 8 little-endian bytes of u64 `v` with `seed` — the
    * window-chain step (Spark's XXH64.hashLong). Both args atomic. */
  private def hashLong(v: String, seed: String): String = {
    val h0 = mod(s"($seed) + ${lit(P5)} + 8")
    bind(h0, "hl", bind(wordRound("hl", v), "hw", fmix("hw")))
  }

  /** (doc_id, fp) over a CTE named `base(doc_id, text)`: simhash64 of the
    * 3-gram XXH64 window chains, exactly as TextKernels.shingleHashes +
    * HashKernels.simhash compute it. */
  private def shingleFpSql: String = {
    val th = s"list_transform(toks, t -> ${xxh64Short("t")})"
    val w1 = s"CASE WHEN w + 0 < t_n THEN ${hashLong("th[w + 1]", lit(Seed))} ELSE ${lit(Seed)} END"
    val w2 = s"CASE WHEN w + 1 < t_n THEN ${bind(w1, "c1", hashLong("th[w + 2]", "c1"))} ELSE $w1 END"
    val w3 = s"CASE WHEN w + 2 < t_n THEN ${bind(w2, "c2", hashLong("th[w + 3]", "c2"))} ELSE $w2 END"
    val wins = s"list_transform(range(0, greatest(t_n - 2, 1)), w -> $w3)"
    val pow = "list_reduce(list_prepend(1::HUGEINT, range(0, b)), (a, z) -> a * 2)"
    val bit = "CASE WHEN 2 * len(list_filter(ws, h -> (h // POW) % 2 = 1)) > len(ws)" +
      " THEN POW ELSE 0::HUGEINT END"
    val fp = "list_reduce(list_prepend(0::HUGEINT, list_transform(range(0, 64), b -> " +
      bind(pow, "POW", bit) + ")), (a, x) -> a + x)"
    s"""toksed AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
       |  FROM base
       |), hashed AS (
       |  SELECT doc_id, $th AS th, len(toks) AS t_n FROM toksed
       |), windowed AS (
       |  SELECT doc_id, $wins AS ws FROM hashed
       |), fps AS (
       |  SELECT doc_id, $fp AS fp FROM windowed
       |)""".stripMargin
  }

  /** The dedup_simhash oracle over the planted near-dup corpus: all pairs
    * within Hamming ≤ `maxHamming` of the exact fingerprints. */
  /** `baseSql` is the corpus CTE body — parameterized (r17) because BOTH
    * simhash entries need the faithful fingerprint replay: the r16-era
    * `dedup_simhash_exact` oracle modeled Hamming-0 pairs as equal token
    * SEQUENCES, which under-counts — simhash is a majority vote over
    * window hashes, deliberately robust to small edits, so two documents
    * differing by one trailing token can (and at sf0.001 do: docs
    * 474/498) collide at Hamming 0 without equal sequences. The 2⁻⁶⁴
    * rarity argument in the old comment applied to a UNIFORM hash, not
    * to simhash. */
  def pairsSql(maxHamming: Int = 3,
      baseSql: String = """SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' graftdup' FROM documents WHERE doc_id % 10 = 0""".stripMargin): String =
    s"""WITH base AS (
       |  $baseSql
       |), $shingleFpSql
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
       |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= $maxHamming""".stripMargin
}
