package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Text-analysis operators over the `documents` table: corpus language
  * distribution, per-document quality scoring, and a stopword-profile
  * language-ID heuristic. Extends the reference's query surface (its only
  * text op is the null/blank QC scan, docs/athena-integrity-check.md:59)
  * with the ops a training-data pipeline runs before filtering.
  *
  * Everything here is built-ins (split / filter / transform / aggregate /
  * regexp_replace) — per-row, scan-side, whole-stage-codegen'd, no UDFs.
  * The only shuffle in the file is langDist's two-phase aggregate, which
  * moves one row per language.
  */
object TextAnalysis {

  /** Tokens: lowercase, split on non-alphanumeric runs, drop empties.
    * The same tokenizer the dedup shingles use — one definition of
    * "token" across the engine. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Corpus language distribution + char mass: one output row per lang.
    * Two-phase hash aggregate; at 100 TB only |langs| rows shuffle. */
  def langDist(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"),
        avg(length(col("text"))).as("avg_chars"))

  private val qcStopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Per-document quality scoring: char/token counts, token char mass,
    * sentence punctuation count, stopword hits — the raw signals behind
    * length/punct/stopword-ratio quality filters. Pure projection. */
  def qualityStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      col("lang"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("token_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("n_punct"),
      size(filter(toks, t => t.isInCollection(qcStopwords))).as("n_stopwords"))
  }

  /** Composite training-data quality filter: the keep/drop decision the
    * quality signals exist for, as one scan-side projection. Rules are the
    * standard public heuristics (length bounds, mean-token-length band,
    * punctuation ceiling, stopword floor); every signal is also emitted so
    * downstream can re-threshold without re-scanning. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val stats = qualityStats(spark, dir)
    val meanTokLen = col("token_chars").cast("double") / col("n_tokens")
    val punctRatio = col("n_punct").cast("double") / col("n_chars")
    val stopRatio = col("n_stopwords").cast("double") / col("n_tokens")
    stats.withColumn("keep",
      col("n_chars") >= 20 && col("n_tokens") >= 5 &&
        meanTokLen.between(2.0, 12.0) &&
        punctRatio <= 0.2 &&
        stopRatio >= 0.01)
  }

  /** Temperature-mixed corpus sampling — the standard multilingual
    * rebalance (public: the `p_l ∝ n_l^α` sampling of the mT5/XLM-R
    * papers): downsample over-represented groups so group l keeps
    * rate (n_l / n_min)^(α−1) — the smallest group keeps everything,
    * a 100× larger group keeps 100^(α−1) (α = 0.5 → 1/10th).
    *
    * Deterministic: the keep decision is the same md5-uniform as
    * [[Relational.stratifiedSample]] compared against the group's rate —
    * reproducible across runs/engines/partitionings, and appending new
    * docs never flips old decisions (rates move, but each doc's u is
    * fixed — only the threshold shifts). Rates are rounded to 9 dp on
    * both engines so the float boundary is exact cross-engine.
    *
    * Scale shape: group counts are one tiny two-phase aggregate (L rows)
    * broadcast back; the keep filter is a scan-side codegen projection.
    * The corpus is read once and never shuffles. */
  def temperatureMix(docs: DataFrame, groupCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol),
        round(pow(col("__n").cast("double") / col("__n_min"), lit(alpha - 1)), 9)
          .as("__rate"))
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0d
    docs.join(broadcast(rates), groupCol)
      .filter(u < col("__rate"))
      .select(col(idCol), col(groupCol))
  }

  /** CORRECTNESS instantiation: α = 0.5 language rebalance of documents. */
  def mixCorpus(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.load(spark, dir, "documents"), "lang", "doc_id")

  /** Stopword profiles for the language-ID heuristic: tiny, hand-picked
    * high-frequency function words per language. Deliberately public
    * common knowledge, not a trained model. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "it", "that", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que", "por", "para"),
  )

  /** N-gram/stopword language-ID heuristic: score = stopword hits per
    * profile; prediction = argmax (ties broken by language code, via
    * lexicographic struct max — deterministic). Row-local: the argmax is
    * an array_max over a fixed-width literal array, no shuffle, no state. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), langIdCol(col("text")))
      .select(col("doc_id"), col("lang"),
        col("langid.pred_lang").as("pred_lang"),
        col("langid.score").as("score"))

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, and runs of
    * other non-space symbols — the shape GPT-style byte-pair encoders
    * pre-split on before merging. Plain character classes only, so Java
    * (Spark) and RE2 (DuckDB oracle) regex dialects agree. */
  val bpeSplitPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"

  /** Token counting: whitespace tokens and BPE-ish pre-tokens per doc,
    * plus an estimated LLM token count (pre-tokens are the upper bound a
    * BPE merge table would start from). Pure codegen'd projection —
    * regexp_count compiles the pattern once per task. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit("\\S+")).as("n_ws_tokens"),
        regexp_count(lower(col("text")), lit(bpeSplitPattern)).as("n_bpe_tokens"))

  /** Document fingerprints: whole-document polynomial hash (exact-dup
    * grouping key that shuffles 8 bytes instead of the text) and the min
    * rolling 8-byte-window Rabin-Karp hash (winnowing-style — stable under
    * edits that miss the minimal window). Both are single-pass codegen'd
    * kernels (graft.functions.TextKernels); at 100 TB the fingerprint IS
    * the dedup shuffle key, so computing it scan-side and never moving the
    * text body is the entire design. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        GraftFunctions.docFingerprint(col("text")).as("fp"),
        GraftFunctions.rollingMinHash(col("text"), 8).as("rolling_fp"))

  /** Token-window document chunking — the segmentation step every
    * training pipeline runs before tokenizer/packing: overlapping windows
    * of `chunk` tokens advancing by `stride` (context preserved across
    * boundaries by the `chunk - stride` token overlap). Row-local:
    * tokenize once, emit ceil((n-chunk)/stride)+1 windows via posexplode —
    * no shuffle, no state, and the text body is read exactly once.
    * Short documents yield one (possibly short) chunk, never zero. */
  def chunkDocs(spark: SparkSession, dir: String,
      chunk: Int = 32, stride: Int = 24): DataFrame =
    chunkDocsOf(Tables.load(spark, dir, "documents"), chunk, stride)

  /** [[chunkDocs]] over any (doc_id, text) DataFrame — the composable form
    * [[graft.PrepJob]] chains after dedup. */
  def chunkDocsOf(docs: DataFrame, chunk: Int = 32, stride: Int = 24): DataFrame = {
    require(chunk > 0 && stride > 0 && stride <= chunk,
      "need 0 < stride <= chunk")
    val toks = tokens(col("text"))
    val nChunks = greatest(lit(1),
      ceil((size(toks) - lit(chunk)).cast("double") / stride).cast("int") + lit(1))
    docs
      .select(col("doc_id"), toks.as("w"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nc") - 1),
          i => slice(col("w"), i * stride + 1, lit(chunk)))))
      .select(
        col("doc_id"), col("pos").as("chunk_id"),
        array_join(col("col"), " ").as("chunk_text"),
        size(col("col")).as("n_chunk_tokens"))
  }

  /** Corpus term statistics / TF-IDF: document frequency, total term
    * frequency, and idf = ln(N/df) per term. One explode + one two-phase
    * aggregate on the term — at 100 TB the shuffle moves one partial row
    * per (partition, term), and N arrives as a 1-row broadcast, not a
    * driver-side collect. idf rounded to 6 dp (libm ln differs across
    * engines in the last ulp). */
  def termStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(
        countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("total_tf"))
      .crossJoin(broadcast(n))
      .select(col("term"), col("df"), col("total_tf"),
        round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
  }

  /** The langId projection as a reusable column: struct(pred_lang, score). */
  def langIdCol(text: Column): Column = {
    val toks = tokens(text)
    val scored = langProfiles.map { case (lang, words) =>
      struct(
        size(filter(toks, t => t.isInCollection(words))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    struct(
      best.getField("lang").as("pred_lang"),
      best.getField("score").as("score")).as("langid")
  }
}
