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
  def qualityStats(spark: SparkSession, dir: String): DataFrame =
    qualityStatsOf(Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text"))

  /** The [[qualityStats]] projection over any (doc_id, lang, text)
    * frame — extra columns pass through untouched (the curation report
    * keeps `source`). */
  def qualityStatsOf(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      (docs.columns.filterNot(Set("text")).map(col).toSeq :+
        length(col("text")).as("n_chars")) ++ Seq(
      size(toks).as("n_tokens"),
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("token_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("n_punct"),
      size(filter(toks, t => t.isInCollection(qcStopwords))).as("n_stopwords")): _*)
  }

  /** The composite keep rule over the [[qualityStats]] columns — ONE
    * definition shared by [[qualityFilter]] and the curation report. */
  def qualityKeep: Column = {
    val meanTokLen = col("token_chars").cast("double") / col("n_tokens")
    val punctRatio = col("n_punct").cast("double") / col("n_chars")
    val stopRatio = col("n_stopwords").cast("double") / col("n_tokens")
    col("n_chars") >= 20 && col("n_tokens") >= 5 &&
      meanTokLen.between(2.0, 12.0) &&
      punctRatio <= 0.2 &&
      stopRatio >= 0.01
  }

  /** Composite training-data quality filter: the keep/drop decision the
    * quality signals exist for, as one scan-side projection. Rules are the
    * standard public heuristics (length bounds, mean-token-length band,
    * punctuation ceiling, stopword floor — [[qualityKeep]], one shared
    * definition); every signal is also emitted so downstream can
    * re-threshold without re-scanning. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    qualityStats(spark, dir).withColumn("keep", qualityKeep)

  /** BPE merge induction — the core loop of tokenizer training (the public
    * byte-pair-encoding algorithm: repeatedly count adjacent token pairs
    * corpus-wide, merge the most frequent) run distributed, word-level,
    * for `iters` rounds. Returns one row per learned merge:
    * (iter, left, right, n).
    *
    * Merge application is defined as NON-OVERLAPPING LEFT-TO-RIGHT
    * replacement over the space-delimited token string (`replace`
    * semantics, identical in Spark and the oracle's SQL dialect) — on a
    * run like "a b a b" the first pair merges and the second survives
    * until a later round, which keeps the operator's output an exact
    * cross-engine fixpoint rather than an implementation detail.
    *
    * Scale shape per round: pair extraction is a row-local
    * transform+explode over the persisted token-string projection (text
    * is canonicalized ONCE); the count is a two-phase aggregate — one row
    * per DISTINCT pair crosses the shuffle; the argmax is a
    * TakeOrdered(1) (bounded driver read, the same legitimacy class as
    * the k-means/PQ trainers' collects); the merge re-enters the next
    * round's plan as a literal replace — a narrow scan-side projection. */
  /** Trainer core shared by [[bpeMerges]] / [[bpeTokenized]]: canonicalize
    * `textCol` ONCE into the padded space-delimited token string, then run
    * up to `iters` count→argmax→replace rounds, returning the learned
    * merge table (application over documents goes through [[bpeApply]]'s
    * single projection instead of this loop's per-round checkpoints).
    *
    * Every round `localCheckpoint`s the merged strings — the same
    * iterative-trainer pattern as [[Similarity.kmeansCentroids]]: round
    * i's pair count reads round i−1's MATERIALIZED output instead of
    * re-executing all i−1 prior replaces, so total work is
    * O(iters·corpus); without it the recompute is O(iters²·corpus) and
    * the nested replace tree deepens linearly (codegen blowup at
    * real-tokenizer merge counts — thousands of rounds). The replace is
    * built from typed Columns (`functions.replace` + `lit`), never an
    * interpolated SQL string, so a quote in a token or a caller-supplied
    * joiner cannot re-parse as SQL. If the corpus runs out of adjacent
    * pairs before `iters` rounds (all docs ≤ 1 token, or merges exhaust
    * the pair space), the loop stops and returns the merges learned so
    * far instead of throwing. */
  private def bpeCore(docs: DataFrame, textCol: String,
      iters: Int, joiner: String): List[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs
      .select(concat(lit(" "), array_join(tokens(col(textCol)), " "), lit(" ")).as("s"))
      .localCheckpoint()
    val merges = collection.mutable.ListBuffer[(Int, String, String, Long)]()
    var exhausted = false
    for (i <- 1 to iters if !exhausted) {
      val toks = split(trim(col("s")), " ")
      val best = cur
        .select(toks.as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("w")) - 1),
          j => struct(element_at(col("w"), j).as("l"),
            element_at(col("w"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .take(1)
      best.headOption match {
        case None => exhausted = true
        case Some((l, r, n)) =>
          merges += ((i, l, r, n))
          cur = cur.withColumn("s",
            replace(col("s"), lit(s" $l $r "), lit(s" $l$joiner$r ")))
            .localCheckpoint()
      }
    }
    merges.toList
  }

  def bpeMerges(docs: DataFrame, textCol: String, iters: Int = 3,
      joiner: String = "§"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, textCol, iters, joiner).toDF("iter", "left", "right", "n")
  }

  /** CORRECTNESS instantiation: 3 merge rounds over documents. */
  def bpeMergeTable(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.load(spark, dir, "documents"), "text")

  /** Apply a LEARNED merge table to tokenize a corpus — the per-document
    * production operator a pipeline runs after [[bpeMerges]] (training is
    * rare; application is every document, forever). The whole merge fold
    * compiles into ONE scan-side codegen projection — a chain of typed
    * `replace` calls over the canonical token string — zero shuffles and
    * zero joins at any corpus size. Merges MUST be applied in learned
    * order: later merges can consume earlier merges' outputs, exactly as
    * during training. Returns (idCol, toks, n_tokens). */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], joiner: String = "§"): DataFrame = {
    val s0 = concat(lit(" "), array_join(tokens(col(textCol)), " "), lit(" "))
    val sN = merges.foldLeft(s0) { case (s, (l, r)) =>
      replace(s, lit(s" $l $r "), lit(s" $l$joiner$r "))
    }
    docs.select(col(idCol),
      trim(sN).as("toks"),
      size(filter(split(trim(sN), " "), t => length(t) > 0))
        .cast("long").as("n_tokens"))
  }

  /** Apply a LANDED merge table (the persisted output of [[bpeMerges]],
    * an artifact like any trained model) — the production two-step:
    * train rarely, load + apply every run. The merge table is
    * vocab-bounded by contract, so the iter-ordered collect is the
    * k-means-centroid legitimacy class; application is [[bpeApply]]'s
    * single scan-side projection. */
  def bpeApplyFromTable(docs: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, joiner: String = "§"): DataFrame = {
    val m = merges.select(col("iter").cast("int"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeApply(docs, idCol, textCol, m, joiner)
  }

  /** CORRECTNESS instantiation: learn 3 merges over documents, then
    * tokenize the SAME corpus with them through the single-projection
    * [[bpeApply]] path (scoring the training corpus keeps the entry
    * OOV-free by construction). */
  def bpeTokenized(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val merges = bpeCore(docs, "text", 3, "§").map(m => (m._2, m._3))
    bpeApply(docs, "doc_id", "text", merges)
  }

  /** STEADY-STATE form of [[bpeTokenized]]: the merge table — the
    * persisted artifact of rare training — is memoized per corpus dir, so
    * timed passes measure the per-document production path alone: ONE
    * scan-side projection folding the learned replaces. First call
    * (Bench's warm-up, Verify's only pass) pays the training. Same
    * answer, same oracle as the retrain entry. */
  private val trainedMerges =
    collection.concurrent.TrieMap[String, Seq[(String, String)]]()
  def bpeTokenizedSteady(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val merges = trainedMerges.getOrElseUpdate(dir,
      bpeCore(docs, "text", 3, "§").map(m => (m._2, m._3)))
    bpeApply(docs, "doc_id", "text", merges)
  }

  /** Tokenizer FERTILITY audit — the published tokenizer-adequacy metric
    * (pieces emitted per raw word, reported per source/domain): a domain
    * whose text the trained tokenizer compresses least is the domain the
    * vocabulary under-serves, the signal that drives vocab resizing or
    * per-domain training before a bad tokenizer inflates sequence
    * lengths corpus-wide. With the word-level trainer ([[bpeMerges]])
    * fertility is the COMPRESSION ratio bpe_tokens/raw_tokens ≤ 1 —
    * sources full of learned collocations compress hardest.
    *
    * Scale shape: the merge fold, the raw count, and the piece count
    * all live in ONE scan-side codegen projection (the [[bpeApply]]
    * chain — zero joins, zero text shuffles); the aggregate moves one
    * row per source. The ratio divides as doubles after the integer
    * sums, 6-dp rounded, with the zero-raw source guarded to 0.0 on
    * both engines. */
  def tokenizerFertility(docs: DataFrame, srcCol: String, textCol: String,
      merges: Seq[(String, String)], joiner: String = "§"): DataFrame = {
    val s0 = concat(lit(" "), array_join(tokens(col(textCol)), " "), lit(" "))
    val sN = merges.foldLeft(s0) { case (s, (l, r)) =>
      replace(s, lit(s" $l $r "), lit(s" $l$joiner$r "))
    }
    docs
      .select(col(srcCol).as("source"),
        size(tokens(col(textCol))).cast("long").as("raw"),
        size(filter(split(trim(sN), " "), t => length(t) > 0))
          .cast("long").as("pieces"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("raw")).as("raw_tokens"),
        sum(col("pieces")).as("bpe_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"), col("bpe_tokens"),
        when(col("raw_tokens") === 0, lit(0.0))
          .otherwise(round(col("bpe_tokens").cast("double") /
            col("raw_tokens").cast("double"), 6)).as("fertility"))
  }

  /** CORRECTNESS instantiation: fertility per source under the standard
    * 3-merge training, merges via the shared steady memo (training paid
    * once per process, the bpeTokenizedSteady artifact). */
  def fertilityDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val merges = trainedMerges.getOrElseUpdate(dir,
      bpeCore(docs, "text", 3, "§").map(m => (m._2, m._3)))
    tokenizerFertility(docs, "source", "text", merges)
  }

  /** Per-(lang, source) corpus token statistics — the summary table a
    * corpus dashboard shows and a mixing policy (txt_mix) consumes:
    * document count, total/mean tokens, and exact p50/p95 via Spark's
    * exact `percentile` (the same (n−1)·p linear interpolation DuckDB's
    * `quantile_cont` defines, so the entry stays hash-checkable).
    * Scale shape: token counting is scan-side; one row per (lang,
    * source) group crosses the shuffle. The exact percentile holds each
    * group's values — fine at realistic group counts; at extreme
    * per-group cardinality swap in `percentile_approx` (the documented
    * trade, like E72 vs exact distinct). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 6).as("mean_tokens"),
        round(percentile(col("n_tokens"), lit(0.5)), 6).as("p50_tokens"),
        round(percentile(col("n_tokens"), lit(0.95)), 6).as("p95_tokens"))

  /** ECDF decile binning — curriculum bucketing by document length
    * without a global sort: bin(d) = floor(10 · |{docs strictly
    * shorter}| / N), computed from the LENGTH HISTOGRAM (distinct length
    * values ≪ corpus — a two-phase count whose shuffle moves one row per
    * distinct length, then a running sum over that tiny table broadcast
    * back onto the scan). Strictly-less rank makes ties land in one bin
    * deterministically — `ntile`'s equal-count split breaks ties by row
    * order, which no two engines (or two runs) need agree on, and a
    * global rank window would sort the corpus. Bins are therefore
    * ragged exactly where values tie: that is the price of determinism,
    * and for curriculum staging it is the right trade. */
  def lengthDecileBins(docs: DataFrame, bins: Int = 10): DataFrame = {
    val byLen = docs.groupBy(length(col("text")).as("len"))
      .agg(count(lit(1)).as("k"))
    // global (partition-less) window, but over the distinct-length
    // histogram only — never the corpus
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("len")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = byLen.select(col("len"),
      coalesce(sum(col("k")).over(w), lit(0L)).as("below"))
    // N from the histogram itself — not a second corpus scan
    val total = byLen.agg(sum(col("k")).as("n"))
    docs.select(col("doc_id"), length(col("text")).as("len"))
      .join(broadcast(cum), "len")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("len"),
        floor(lit(bins) * col("below") / col("n")).cast("long").as("bin"))
  }

  def docLengthBins(spark: SparkSession, dir: String): DataFrame =
    lengthDecileBins(Tables.load(spark, dir, "documents"))

  /** Byte-entropy quality scoring: Shannon entropy (nats) of each
    * document's byte distribution — near-zero entropy flags
    * repeated-character padding and boilerplate, unusually high entropy
    * flags random/binary junk; the cheapest corpus-hygiene signal next to
    * [[repetitionStats]]' token-level ones because it needs no tokenizer
    * at all. Pure scan-side codegen kernel (`byte_entropy`,
    * O(bytes + 256) per row) — zero shuffles at any corpus size. */
  def entropyScores(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      round(GraftFunctions.byteEntropy(col("text")), 6).as("entropy"))

  /** Bigram language-model scoring with add-one smoothing: train token
    * bigram counts on the corpus itself, then score each document's
    * log-likelihood under the model — the classic perplexity-flavored
    * quality signal (a doc whose word transitions are improbable under
    * the corpus distribution is boilerplate, gibberish, or off-domain).
    * p(r | l) = (c(l,r) + 1) / (c(l) + V), V = |distinct tokens|;
    * ll = Σ ln p over the doc's bigrams (6-dp rounded — summation order
    * differs across engines). Self-scoring keeps the entry OOV-free:
    * every scored bigram exists in the model by construction.
    *
    * Scale shape: the doc→bigram explode is row-local and deliberately
    * RECOMPUTED for the model and scoring branches — persisting the
    * exploded corpus (≈ 2× corpus bytes) costs more than a second
    * columnar scan at 100 TB. Model counts are a two-phase aggregate (one
    * row per DISTINCT bigram shuffles); c(l) folds out of the model
    * itself (model-sized, never the corpus); scoring is ONE corpus-scale
    * equi-join on (l, r) — how you score against a model too big to
    * broadcast — and V rides a 1-row broadcast cross join. */
  def bigramLogLik(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    def pairs = docs
      .select(col(idCol), toks.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        j => struct(element_at(col("w"), j).as("l"),
          element_at(col("w"), j + 1).as("r")))).as("p"))
      .select(col(idCol), col("p.l").as("l"), col("p.r").as("r"))
    val model = pairs.groupBy("l", "r").agg(count(lit(1)).as("c_lr"))
    val lc = model.groupBy("l").agg(sum(col("c_lr")).as("c_l"))
    val vocab = docs.select(explode(toks).as("t"))
      .agg(count_distinct(col("t")).as("v"))
    pairs
      .join(model.join(lc, "l"), Seq("l", "r"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log((col("c_lr") + lit(1.0d)) / (col("c_l") + col("v")))), 6)
          .as("ll"))
  }

  /** CORRECTNESS instantiation over documents. */
  def bigramScores(spark: SparkSession, dir: String): DataFrame =
    bigramLogLik(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** Domain reweighting by EXCESS LOSS — the DoReMi-class mixing form
    * (Xie et al., NeurIPS'23: upweight domains whose loss under a
    * generalist model exceeds their loss under a domain-fit reference;
    * excess loss is the signal that a domain is distinctive /
    * under-served by the mixture). The missing fourth member of the
    * mixing family next to temperature (E56), token budgets
    * (E124/E157), and DSIR importance weights (E153): those reweight by
    * SIZE or by similarity to a target — this one reweights by how much
    * the corpus-wide model UNDERFITS each domain. Deterministic
    * replay of the one-step multiplicative update: reference = each
    * domain's own add-one bigram LM, generalist = the corpus-wide
    * bigram LM ([[bigramLogLik]]'s model, verbatim); per-domain mean
    * excess NLL drives w_d ∝ share_d · exp(η · excess_d), normalized.
    *
    * Cross-engine float discipline (the curation-report lesson applied
    * to a float signal): log-probs round at 6 dp PER DISTINCT MODEL ROW
    * and lift to integer MICRO-NATS, so every per-source aggregate is an
    * exact integer sum (summed through decimal(38,0) — per-source totals
    * run n_bigrams·|log p|·10⁶ ≈ 10²⁰ at 100 TB, past long); the mean is
    * one IEEE divide of exact inputs; exp/softmax touch |sources|
    * scalars with the normalizer summed in source order (an ORDERED
    * full-frame window — engine-order-free).
    *
    * MODEL-ROW REGROUPING (what makes the state landable AND the
    * scoring model-sized): within a source every occurrence of bigram
    * (l, r) scores the same log-prob under both LMs, so the per-source
    * total log-lik regroups as Σ_{(l,r)} c_slr · log p — a fold over
    * DISTINCT (source, l, r) model rows, never the corpus-scale
    * occurrence stream. Per-source n_docs = docs with ≥ 1 bigram is the
    * one extra additive relation. The round-12 form scored per
    * occurrence (one scoring-join row per corpus bigram, ~10¹³ at
    * 100 TB, then rounded per doc); the output is per-SOURCE, so the
    * per-doc granularity bought nothing — this form's scoring join is
    * model-sized given the counts, and the counts are exactly the
    * additive (source, l, r, n) generations
    * [[graft.streaming.UnifiedIngest]] maintains
    * ([[domainReweightFromModel]] is the shared tail; the steady serve
    * is the same fold over landed state with no corpus pass at all).
    *
    * Scale shape: ONE row-local bigram explode feeds the (source, l, r)
    * two-phase count (map-side combine collapses occurrences before the
    * exchange); the corpus-wide model folds out of the per-source one
    * (model-sized); everything downstream of the counts is model- or
    * |sources|-sized. */
  def domainReweight(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, eta: Double = 1.0): DataFrame =
    domainReweightFromModel(
      bigramModelRows(docs, textCol, srcCol),
      lmVocabRows(docs, textCol, srcCol),
      lmDocStats(docs, textCol, srcCol), eta)

  /** The per-source add-one bigram LM as data: one (source, l, r, n) row
    * per distinct per-source bigram — the ADDITIVE relation the unified
    * loop lands per batch (occurrence counts sum across batches to the
    * union's counts, with no arrival-order dependence at all). The
    * corpus-wide model is its (l, r) regroup — derived, never stored. */
  def bigramModelRows(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs
      .select(col(srcCol).as("source"), toks.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("source"), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        j => struct(element_at(col("w"), j).as("l"),
          element_at(col("w"), j + 1).as("r")))).as("p"))
      .groupBy(col("source"), col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("n"))
  }

  /** DISTINCT (source, token) rows — the vocabulary-size side of the LM
    * state (per-source V_s and the corpus V are counts over it; distinct
    * rows union across batches to the union's distinct set, so the
    * landed fold is `distinct`, duplication-inert under a
    * distinct-serving read). */
  def lmVocabRows(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame =
    docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("t"))
      .distinct()

  /** Per-source count of documents with ≥ 1 bigram (= ≥ 2 tokens) —
    * the n_docs relation of the reweight output, additive per batch. */
  def lmDocStats(docs: DataFrame, textCol: String,
      srcCol: String): DataFrame =
    docs.filter(size(tokens(col(textCol))) >= 2)
      .groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))

  /** The DoReMi-class tail over LM state: `dmodel` = (source, l, r, n)
    * per-source bigram counts, `dvocab` = distinct (source, t) token
    * rows (re-distincted here, so duplication-inert generation reads are
    * safe), `stats` = (source, n_docs). Everything here is model- or
    * |sources|-sized — the 100 TB serve path given maintained counts.
    * Shared verbatim by the batch operator, the landed steady serve
    * ([[domainReweightSteadyDocs]]) and the unified loop's serve
    * ([[graft.streaming.UnifiedIngest.domainWeights]]), which is what
    * makes serve ≡ batch a one-liner. */
  def domainReweightFromModel(dmodel: DataFrame, dvocab: DataFrame,
      stats: DataFrame, eta: Double = 1.0): DataFrame =
    domainReweightFromExcess(domainExcessRows(dmodel, dvocab, stats), eta)

  /** The η-INDEPENDENT half of [[domainReweightFromModel]]: per-source
    * (n_docs, n_bigrams, micro — the integer micro-nat excess sum).
    * Every term here is a pure function of the LM state and the mixing
    * parameter η never enters — so a deployment re-tuning η per training
    * run LANDS these |sources| rows once per corpus snapshot
    * ([[domainReweightSteadyDocs]]) and each re-sweep is the
    * [[domainReweightFromExcess]] tail over 4 columns × |sources| rows,
    * with the model relations untouched. Rebuild-only under corpus
    * change (micro depends on the GLOBAL model — c_lr, c_l, |V| — so
    * the rows are not additive over batches; the unified loop therefore
    * maintains the three model relations and recomputes this fold at
    * serve time instead). */
  def domainExcessRows(dmodel: DataFrame, dvocab: DataFrame,
      stats: DataFrame): DataFrame = {
    val vrows = dvocab.distinct()
    val model = dmodel.groupBy("l", "r").agg(sum(col("n")).as("c_lr"))
    val lc = model.groupBy("l").agg(sum(col("c_lr")).as("c_l"))
    val dlc = dmodel.groupBy("source", "l").agg(sum(col("n")).as("c_sl"))
    val vocab = vrows.select(col("t")).distinct().agg(count(lit(1)).as("v"))
    val dv = vrows.groupBy("source").agg(count(lit(1)).as("v_s"))
    // integer micro-nats per DISTINCT model row: 6-dp-round the log-prob,
    // lift, multiply by the occurrence count — exact integers from here
    def micro(c: Column, denom: Column): Column =
      round(round(log((c + lit(1.0d)) / denom), 6) * 1e6).cast("long")
    dmodel
      .join(model.join(lc, "l"), Seq("l", "r"))
      .join(dlc, Seq("source", "l"))
      .crossJoin(broadcast(vocab))
      .join(broadcast(dv), "source")
      .select(col("source"), col("n"),
        (col("n") * (micro(col("n"), col("c_sl") + col("v_s"))
          - micro(col("c_lr"), col("c_l") + col("v")))).as("micro"))
      .groupBy("source")
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("micro").cast("decimal(38,0)")).as("micro"))
      .join(stats.select(col("source"), col("n_docs")), "source")
  }

  /** The η tail over [[domainExcessRows]]' |sources| rows: exact-integer
    * mean excess (one IEEE divide, 6-dp), the multiplicative update
    * u ∝ share·exp(η·xloss), and the source-ordered softmax normalizer
    * (ordered full-frame window — engine-order-free). */
  def domainReweightFromExcess(excess: DataFrame,
      eta: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = excess.agg(sum(col("n_bigrams")).as("tb"))
    val wAll = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    excess
      .crossJoin(broadcast(tot))
      .withColumn("xloss",
        round(col("micro").cast("double") / 1e6 / col("n_bigrams"), 6))
      .withColumn("u",
        col("n_bigrams").cast("double") / col("tb")
          * exp(lit(eta) * col("xloss")))
      .withColumn("weight", round(col("u") / sum(col("u")).over(wAll), 6))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        col("xloss"), col("weight"))
  }

  /** CORRECTNESS instantiation: η = 1 one-step DoReMi-class update over
    * the documents table's sources. */
  def domainReweightDocs(spark: SparkSession, dir: String): DataFrame =
    domainReweight(Tables.load(spark, dir, "documents"),
      "doc_id", "text", "source")

  /** Catalog prefix for the landed LM state of a corpus dir (the MD5
    * collision rationale shared with [[curationPrefix]]). */
  def lmPrefix(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"lm_state_$suffix"
  }

  /** Land the three LM-state relations as catalog tables — the corpus
    * scan paid ONCE per (immutable) corpus dir: the per-source bigram
    * model (model-sized), the distinct (source, token) vocabulary rows,
    * and the |sources|-row doc stats. */
  def landLmState(docs: DataFrame, prefix: String, path: String): Unit = {
    def land(df: DataFrame, name: String): Unit =
      df.write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
        .option("path", s"$path/$name").saveAsTable(s"${prefix}_$name")
    land(bigramModelRows(docs, "text", "source"), "model")
    land(lmVocabRows(docs, "text", "source"), "vocab")
    land(lmDocStats(docs, "text", "source"), "stats")
    // the η-independent per-source excess fold, landed WITH the model
    // relations (round-14: the steady serve's only model-sized work was
    // this fold — landing it makes every η re-sweep |sources|-sized)
    land(domainExcessRows(spark_table(prefix, "model", docs),
      spark_table(prefix, "vocab", docs),
      spark_table(prefix, "stats", docs)), "excess")
  }

  /** Read a just-landed LM table back (landLmState helper — the excess
    * fold must run over the LANDED bytes so a crash between writes can
    * never land an excess row inconsistent with its model rows). */
  private def spark_table(prefix: String, name: String,
      docs: DataFrame): DataFrame =
    docs.sparkSession.table(s"${prefix}_$name")

  /** STEADY-STATE [[domainReweightDocs]] — the reweight served off the
    * MAINTAINED LM state instead of a per-request corpus rescan (the
    * round-12 observation: the direct form pays two corpus-scale LM
    * scorings per invocation, 2.4 s at sf0.1 and linear — a non-answer
    * for a train-time mixing dial re-tuned per run at 100 TB): the
    * model/vocab/stats relations land once per corpus dir, every serve
    * is [[domainReweightFromModel]] over model-sized state — η can be
    * re-swept per training run with no text read. Same answer, same
    * oracle as the direct entry (landed ≡ direct law: occurrence counts
    * are additive, distinct-token rows union — no arrival-order term);
    * the streaming maintenance of the same relations lives in
    * [[graft.streaming.UnifiedIngest]]'s `lm/` generations. */
  def domainReweightSteadyDocs(spark: SparkSession, dir: String,
      eta: Double = 1.0): DataFrame = {
    val prefix = lmPrefix(dir)
    graft.sources.Landing.ensureLanded(spark, prefix,
      Seq("model", "vocab", "stats", "excess").map(t => s"${prefix}_$t")) {
      path =>
        landLmState(Tables.load(spark, dir, "documents"), prefix, path)
    }
    // serve = the η tail over the LANDED |sources|-row excess fold: the
    // model relations stay landed for audits/other serves, but an η
    // re-sweep never touches them (round-14 — previously the serve
    // re-ran the model-sized excess fold per invocation, the thinnest
    // steady win on the board at 1.07 s vs 1.63 s direct)
    domainReweightFromExcess(spark.table(s"${prefix}_excess"), eta)
  }

  /** CCNet-style perplexity bucketing — the published Common Crawl
    * recipe's final quality split (Wenzek et al. 2019: score every
    * document under a language model, cut each LANGUAGE's score
    * distribution into head / middle / tail terciles, and let the
    * consumer choose which strata to train on): the model is the
    * engine's own [[bigramLogLik]] (their KenLM seat), the per-document
    * score is the length-normalized mean bigram log-likelihood (the
    * perplexity ordering, negated — higher = less perplexed = head),
    * and the cutoffs are PER-LANGUAGE so a language's bucket membership
    * never depends on how other languages score (CCNet's point).
    *
    * Scale shape: scoring is the bigram-LM plan unchanged; the tercile
    * cutoffs are a two-phase exact `percentile` aggregate — ONE row per
    * language crosses the shuffle (the [[calibratedQualityFloor]]
    * quantile-cutoff discipline, same (n−1)·p interpolation as DuckDB's
    * `quantile_cont`), broadcast back; the bucket label is a scan-side
    * compare. Scores and cutoffs are 6-dp rounded BEFORE comparing so a
    * last-ulp interpolation difference cannot flip a boundary row
    * cross-engine. Documents under 2 tokens have no bigrams and no
    * perplexity — excluded up front, the [[bigramLogLik]] contract. */
  def pplBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val scored = bigramLogLik(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(langCol).as("lang")), idCol)
      .select(col(idCol).as("doc_id"), col("lang"),
        round(col("ll") / col("n_bigrams"), 6).as("ll_norm"))
    val cuts = scored.groupBy("lang")
      .agg(round(percentile(col("ll_norm"), lit(1.0 / 3)), 6).as("c1"),
        round(percentile(col("ll_norm"), lit(2.0 / 3)), 6).as("c2"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("ll_norm"),
        when(col("ll_norm") >= col("c2"), lit("head"))
          .when(col("ll_norm") >= col("c1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** CORRECTNESS instantiation over documents (per-lang terciles). */
  def pplBucketDocs(spark: SparkSession, dir: String): DataFrame =
    pplBuckets(Tables.load(spark, dir, "documents"), "doc_id", "text", "lang")

  /** Okapi BM25 ranked retrieval — the standard lexical search scoring
    * (Robertson/Lucene idf form) the TF-IDF family stops short of: for a
    * literal query term set, score every matching document
    *
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)
    *
    * and return the top `k` by score (ties on id ascending —
    * deterministic cross-engine; the 6-dp round is the [[bigramLogLik]]
    * summation-order discipline).
    *
    * Scale shape: the candidate branch prunes DOC-LEVEL scan-side
    * (`arrays_overlap` against the literal query array) BEFORE the
    * explode, so only matching documents ever explode, and the term
    * filter keeps at most |Q| rows per matching doc; (doc, term) tf is a
    * two-phase count; df and the (N, avgdl) stats are query-sized /
    * 1-row broadcasts; the k-cut is a per-task-heap
    * `TakeOrderedAndProject`. The corpus-wide stats branch is a second
    * column-pruned scan (a production deployment lands dl at ingest and
    * reads the stats from table metadata). */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && k > 0)
    val withLen = docs
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol), col("w"), size(col("w")).as("dl"))
    val stats = withLen
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = withLen
      .filter(arrays_overlap(col("w"), typedlit(query)))
      .select(col(idCol), col("dl"), explode(col("w")).as("term"))
      .filter(col("term").isin(query: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25ScoreTail(tf, dfs, stats, k, k1, b, idCol)
  }

  /** The CORRECTNESS query set for [[searchDocs]] — public so the spec
    * and the oracle SQL state the same literal. */
  val searchQuery: Seq[String] = Seq("vector", "merge", "stream")

  /** CORRECTNESS instantiation: BM25 top-25 for [[searchQuery]]. */
  def searchDocs(spark: SparkSession, dir: String): DataFrame =
    bm25Rank(Tables.load(spark, dir, "documents"), "doc_id", "text",
      searchQuery, k = 25)

  /** Land the BM25 inverted index: a postings table (term, doc_id, dl,
    * tf) BUCKETED BY TERM — the search-engine layout — plus a 1-row
    * (n_docs, avgdl) stats table. dl is denormalized into the postings
    * (8 bytes/row) so serving never joins a document table. Bucketing by
    * term is the serve-cost bound: Spark prunes buckets on `term IN (…)`,
    * so a query reads ~|Q|/buckets of the index regardless of corpus
    * size. */
  def landSearchIndex(docs: DataFrame, idCol: String, textCol: String,
      prefix: String, path: String, buckets: Int = 32): Unit = {
    val withLen = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    graft.sources.Layout.writeBucketed(
      withLen
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf")),
      s"${prefix}_postings", Seq("term"), Seq("term", "doc_id"),
      buckets, s"$path/postings")
    // positional postings — one (term, doc_id, pos) row per token
    // OCCURRENCE (the postings table above collapses to tf) — the layout
    // phrase/proximity queries serve from; bucketed by term like the
    // postings so `term IN (phrase)` prunes to the phrase terms' buckets
    graft.sources.Layout.writeBucketed(
      withLen.select(col("doc_id"), posexplode(col("w")))
        .select(col("col").as("term"), col("doc_id"),
          (col("pos") + 1).as("pos")),
      s"${prefix}_positions", Seq("term"), Seq("term", "doc_id", "pos"),
      buckets, s"$path/positions")
    withLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/stats").saveAsTable(s"${prefix}_stats")
  }

  /** [[bm25Rank]] served from a LANDED index ([[landSearchIndex]]): the
    * bucket-pruned postings scan reads only the query terms' buckets, df
    * derives from the pruned rows themselves (df = postings count per
    * term), and stats ride the landed 1-row broadcast — the per-query
    * cost is postings-of-Q, independent of corpus size, with no
    * tokenize/explode in the serve plan. Identical scoring expression →
    * identical answer to the direct form. */
  def bm25RankIndexed(spark: SparkSession, prefix: String,
      query: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty && k > 0)
    val tf = spark.table(s"${prefix}_postings")
      .filter(col("term").isin(query: _*))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = spark.table(s"${prefix}_stats")
    bm25ScoreTail(tf, dfs, stats, k, k1, b)
  }

  /** The shared BM25 scoring tail over tf(doc_id, dl, term, tf) rows —
    * the association order both [[bm25Rank]] and [[bm25RankIndexed]]
    * (and the oracle SQL) must run identically. */
  private[graft] def bm25ScoreTail(tf: DataFrame, dfs: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double,
      idCol: String = "doc_id"): DataFrame = {
    val idf = log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") +
      lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      // (k1 + 1) as a folded Column, not a Scala-side sum: both engines
      // must run the same IEEE add on double(k1), or the constant can
      // differ from the oracle's `(1.2 + 1.0)` by one ulp
      .select(col(idCol),
        (idf * col("tf") * (lit(k1) + lit(1.0)) / denom).as("s"))
      .groupBy(col(idCol))
      .agg(round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Exact-phrase occurrence count — the positional-search primitive,
    * spelled as a pure scan-side array kernel instead of the classic
    * positional-postings self-join: for an L-token phrase, count the
    * window starts where every phrase token matches at its offset. Zero
    * shuffles, zero explode — the whole operator is one projection over
    * the corpus scan (the L−1 positional equi-joins of the postings
    * spelling would shuffle |phrase| exploded copies of every matching
    * term's positions at 100 TB).
    *
    * The window test is ONE regex pass, not a per-position array lambda:
    * [[tokens]] emits only `[a-z0-9]+` strings, so re-joining them on
    * `\u0001` gives a string in which token boundaries are exactly the
    * delimiter positions, and a zero-width lookahead
    * `(?=\u0001tok1\u0001…\u0001tokL\u0001)` counts every window start —
    * zero-width so overlapping occurrences all count (`Matcher.find`
    * advances one char past a zero-width match). Spelling this as a
    * higher-order `filter` over window starts instead runs an
    * INTERPRETED lambda per token position (HOF lambdas don't codegen)
    * and measured ~15× slower on the sf0.1 corpus (4–5 s vs ~0.3 s);
    * `regexp_count` is a single compiled-pattern scan per document. */
  def phraseCount(textCol: Column, phrase: Seq[String]): Column = {
    require(phrase.length >= 2, "a phrase is at least two tokens")
    val d = "\u0001"
    val joined = concat(lit(d), array_join(tokens(textCol), d), lit(d))
    val pat =
      "(?=" + java.util.regex.Pattern.quote(d + phrase.mkString(d) + d) + ")"
    coalesce(regexp_count(joined, lit(pat)), lit(0))
  }

  /** The CORRECTNESS phrase — public so the oracle SQL and spec state
    * the same literal. */
  val searchPhrase: Seq[String] = Seq("fast", "scan")

  /** CORRECTNESS instantiation: documents containing the exact phrase
    * [[searchPhrase]], with occurrence counts. */
  def phraseDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        phraseCount(col("text"), searchPhrase).as("n_occ"))
      .filter(col("n_occ") > 0)

  /** [[phraseCount]] served from the LANDED positional index
    * ([[landSearchIndex]]'s `_positions` table) — the steady-state
    * answer to phrase queries: where the scan kernel re-reads the whole
    * corpus text per query, this plan reads ONLY the phrase terms'
    * bucket-pruned position lists and intersects them (an occurrence at
    * `start` is a position row for token i at `start + i`, every i), so
    * per-query cost is positions-of-phrase-terms — independent of corpus
    * size, no tokenize in the serve plan. The L−1 self-joins key on
    * (doc_id, start): the shuffled relations are the PRUNED position
    * lists, not the corpus — at 100 TB that is the difference between
    * this spelling and the one [[phraseCount]]'s Scaladoc rejects for
    * index-free scans. A repeated phrase token intersects the same
    * pruned list at shifted offsets — still correct (the join is on the
    * derived start, not the position). */
  def phraseCountIndexed(spark: SparkSession, prefix: String,
      phrase: Seq[String]): DataFrame =
    phraseCountOver(spark.table(s"${prefix}_positions"), phrase)

  /** The positional intersection over ANY (term, doc_id, pos) relation —
    * the landed `_positions` table or the streaming maintainer's
    * accumulated generations ([[graft.streaming.StreamSearchIndex]]).
    * Callers whose relation may transiently duplicate rows must dedup
    * first: the L-way join MULTIPLIES duplicated (doc_id, start) rows,
    * so occurrence counts are NOT duplication-inert. */
  private[graft] def phraseCountOver(positions: DataFrame,
      phrase: Seq[String]): DataFrame = {
    require(phrase.length >= 2, "a phrase is at least two tokens")
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      positions
        .filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    starts.reduce(_.join(_, Seq("doc_id", "start")))
      .groupBy("doc_id")
      // int, matching the scan kernel's regexp_count occurrence type
      .agg(count(lit(1)).cast("int").as("n_occ"))
  }

  /** STEADY-STATE [[phraseDocs]]: serve [[searchPhrase]] from the landed
    * positional index — same answer, same oracle; the timed cost is the
    * production serve plan. Occurrence counts > 0 by construction (only
    * matching starts survive the intersection). */
  def phraseDocsSteady(spark: SparkSession, dir: String): DataFrame = {
    ensureSearchIndex(spark, dir)
    phraseCountIndexed(spark, searchIndexPrefix(dir), searchPhrase)
  }

  /** PROXIMITY ranking — the minimum covering window (the classic IR
    * proximity signal, Clarke et al.'s cover density class: the
    * tightest token span containing at least one occurrence of EVERY
    * query term; tighter = more topical than scattered mentions), the
    * retrieval-family member between the unordered bag ([[bm25Rank]])
    * and the exact sequence ([[phraseCount]]).
    *
    * The algorithm is the published last-occurrence scan: walking the
    * doc's query-term occurrences in position order, the best window
    * ENDING at position p is p − min(last occurrence of each term) + 1
    * once every term has been seen; the document's score is the min
    * over p. Spelled as ONE window pass — q `max(CASE)` columns over
    * the same (doc_id, pos) frame, then least/min — all integer math,
    * no float discipline anywhere.
    *
    * Scale shape: candidate docs prune SCAN-SIDE (every query term
    * `array_contains` before the explode — only docs containing ALL
    * terms ever explode), only query-term occurrence rows (doc_id, pos,
    * term) shuffle into the doc-keyed window, per-doc frames are
    * occurrence-list-bounded (never a whole-partition sort), and the
    * final min-per-doc aggregate reuses the window's partitioning — no
    * second exchange. The STEADY form serves the same tail off the
    * landed bucket-pruned `_positions` table: no tokenize, no explode,
    * a `term IN (query)` scan that reads only the query terms'
    * buckets. */
  def proximityRank(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String]): DataFrame = {
    val w = tokens(col(textCol))
    val positions = docs
      .filter(query.map(t => array_contains(w, t)).reduce(_ && _))
      .select(col(idCol).as("doc_id"), posexplode(w))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col").as("term"))
    proximityOver(positions, query)
  }

  /** The window-scan tail over ANY (term, doc_id, pos) relation — the
    * direct tokenize, the landed `_positions` table, or the streaming
    * maintainer's accumulated generations (manifest-resolved: the
    * L-last-occurrence scan is NOT duplication-inert). */
  private[graft] def proximityOver(positions: DataFrame,
      query: Seq[String]): DataFrame = {
    require(query.length >= 2 && query.distinct == query,
      "proximity needs >= 2 distinct terms")
    import org.apache.spark.sql.expressions.Window
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val lasts = query.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("pos"))).over(frame).as(s"__l$i")
    }
    val occ = positions.filter(col("term").isin(query: _*))
      .select(col("doc_id") +: col("pos") +: lasts: _*)
    occ
      .filter(query.indices.map(i => col(s"__l$i").isNotNull).reduce(_ && _))
      .select(col("doc_id"),
        (col("pos") - least(query.indices.map(i => col(s"__l$i")): _*) + 1)
          .as("win"))
      .groupBy("doc_id")
      .agg(min(col("win")).cast("long").as("prox_win"))
  }

  /** CORRECTNESS instantiation: minimum [[searchQuery]]-covering window
    * per matching document. */
  def proximityDocs(spark: SparkSession, dir: String): DataFrame =
    proximityRank(Tables.load(spark, dir, "documents"), "doc_id", "text",
      searchQuery)

  /** STEADY-STATE [[proximityDocs]]: the same window tail off the landed
    * bucket-pruned positional index — same answer, same oracle. */
  def proximityDocsSteady(spark: SparkSession, dir: String): DataFrame = {
    ensureSearchIndex(spark, dir)
    proximityOver(spark.table(s"${searchIndexPrefix(dir)}_positions"),
      searchQuery)
  }

  /** Catalog table-name prefix for a corpus dir's landed search index
    * (MD5 of the dir — the [[graft.operators.Dedup.steadyIndexPrefix]]
    * collision rationale). */
  def searchIndexPrefix(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"search_steady_$suffix"
  }

  /** Land the search index for a corpus dir once per catalog: ALL the
    * index tables must exist — a land that failed between the writes
    * must re-land (Overwrite), not wedge every later serve. */
  private def ensureSearchIndex(spark: SparkSession, dir: String): Unit = {
    val prefix = searchIndexPrefix(dir)
    val tables = Seq("_postings", "_positions", "_stats").map(prefix + _)
    graft.sources.Landing.ensureLanded(spark, prefix, tables) { path =>
      landSearchIndex(Tables.load(spark, dir, "documents"),
        "doc_id", "text", prefix, path)
    }
  }

  /** STEADY-STATE [[searchDocs]]: land the inverted index once per
    * (catalog, corpus dir), then serve every query from the bucket-pruned
    * landed tables — same answer, same oracle; the timed cost is the
    * production serve plan. */
  def searchDocsSteady(spark: SparkSession, dir: String): DataFrame = {
    ensureSearchIndex(spark, dir)
    bm25RankIndexed(spark, searchIndexPrefix(dir), searchQuery, k = 25)
  }

  /** Token-BUDGET corpus mix — the other published mixing form next to
    * [[mixCorpus]]'s temperature sampling: each source contributes
    * documents, in a deterministic hash order, until its token budget is
    * spent (here `frac` of its own token mass; any budget table plugs into
    * the same plan). The keep rule is greedy-prefix: a doc is kept iff the
    * tokens BEFORE it in its source's hash order are under budget — so
    * the set is reproducible across runs, engines, and partitionings
    * (the md5-order device of [[Similarity.clusterSample]]).
    *
    * The running total is a DISTRIBUTED prefix sum, not one window per
    * source (a giant domain would total-sort in a single task — the
    * [[Relational.deterministicShuffle]] problem, solved the same way):
    * the 2-hex-char md5 prefix range-buckets each source's hash order
    * into 256 slices; per-(source, bucket) token totals take a TINY
    * window (≤ 256·|sources| rows) for bucket offsets — no driver
    * collect, unlike the shuffle's dense-literal variant, because the
    * offsets join back by (source, bucket) broadcast — and each slice
    * running-sums only its own rows. cum_before = bucket offset +
    * intra-slice running sum − own tokens: exactly the per-source
    * ROWS-UNBOUNDED-PRECEDING window, with the work of a bucketed sort. */
  def budgetMix(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, frac: Double): DataFrame = {
    val rows = tokenCountRows(docs, idCol, textCol, srcCol)
    val budgets = rows.groupBy("source")
      .agg(floor(lit(frac) * sum(col("n_tokens"))).cast("long").as("budget"))
    withCumBefore(rows)
      .join(broadcast(budgets), "source")
      .filter(col("cum_before") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** The (doc_id, source, n_tokens) projection the budget cuts run over —
    * tokenization happens here ONCE; the cut itself never needs text
    * (which is what lets the streamed form fold landed rows without
    * re-reading any document). NULL text coalesces to "" BEFORE the
    * size — the [[graft.operators.Packing.tokenBlocks]] convention
    * (`size(split(NULL))` is −1 under legacy sizeOfNull, which would
    * subtract a phantom token here and shift every later doc's offsets
    * in any layout built from these counts relative to the from-text
    * batch operator). */
  private[graft] def tokenCountRows(docs: DataFrame, idCol: String,
      textCol: String, srcCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"),
      size(tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_tokens"))

  /** The distributed per-source prefix sum under the md5 hash order (see
    * [[budgetMix]]'s scaladoc for why this is range-bucketed rather than
    * one window per source): adds `cum_before` = tokens strictly before
    * the row in its source's (h, doc_id) order. */
  private def withCumBefore(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = rows
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val wOff = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("source", "bucket")
      .agg(sum(col("n_tokens")).as("bt"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("bt")).over(wOff), lit(0L)).as("offset"))
    val wIn = Window.partitionBy("source", "bucket").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("cum_before",
        col("offset") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
  }

  /** ABSOLUTE per-source token budget — the fixed-allowance form of
    * [[budgetMix]] ("collect at most `budget` tokens per domain",
    * the production knob when the target mix is stated in tokens, not
    * fractions): same deterministic md5-order greedy-prefix keep rule,
    * same distributed prefix sum, but the budget is a constant — which
    * is exactly what makes the cut ABSORBING
    * (cut(cut(A) ∪ B) = cut(A ∪ B): adding rows can only GROW a doc's
    * prefix mass, never shrink it, so a cut doc stays cut — unlike the
    * fractional form, whose budget itself grows with the corpus), and
    * therefore streamable as a compaction fold
    * ([[graft.streaming.StreamBudget]]). Operates on pre-tokenized
    * (doc_id, source, n_tokens) rows; [[budgetCap]] is the from-text
    * entry. */
  def budgetCapRows(rows: DataFrame, budget: Long): DataFrame =
    withCumBefore(rows)
      .filter(col("cum_before") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"))

  /** [[budgetCapRows]] over raw documents: tokenize once, cut. */
  def budgetCap(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, budget: Long): DataFrame =
    budgetCapRows(tokenCountRows(docs, idCol, textCol, srcCol), budget)

  /** CORRECTNESS instantiation: 100 tokens per source — binds at every
    * test SF (per-source masses run ~10× that at sf0.01) while always
    * keeping each source's first-hash document (cum_before = 0). */
  def budgetCapDocs(spark: SparkSession, dir: String): DataFrame =
    budgetCap(Tables.load(spark, dir, "documents"),
      "doc_id", "text", "source", budget = 100L)

  /** CORRECTNESS instantiation: cap every source at 30% of its own token
    * mass. */
  def budgetMixDocs(spark: SparkSession, dir: String): DataFrame =
    budgetMix(Tables.load(spark, dir, "documents"),
      "doc_id", "text", "source", frac = 0.3)

  /** Per-source CALIBRATED quality floor — the within-domain sibling of
    * the global [[qualityFilter]] thresholds, after the public web-corpus
    * observation that raw quality signals are not comparable across
    * domains (a forum's stopword-ratio distribution sits far below a news
    * site's, so one global floor over-prunes informal sources and
    * under-prunes spammy formal ones): drop the bottom `floor` quantile
    * of each source's own score distribution.
    *
    * The scalable spelling is a per-source QUANTILE CUTOFF, not a
    * percent_rank window: a rank window partitioned by source needs a
    * total sort of each source's rows in one task — a giant domain (10%
    * of a 100 TB corpus) serializes. The cutoff is a two-phase exact
    * `percentile` aggregate (ONE row per source over the shuffle — the
    * [[corpusStats]] discipline, same (n−1)·p interpolation as DuckDB's
    * `quantile_cont`), broadcast back, and the keep decision is a
    * scan-side compare. Score and cutoff are both 6-dp rounded BEFORE
    * the compare so a last-ulp interpolation difference cannot flip a
    * boundary row cross-engine. Zero-token docs are dropped up front
    * (below any floor by definition — a ratio over 0 tokens has no
    * value). */
  def calibratedQualityFloor(docs: DataFrame, floor: Double): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs
      .select(col("doc_id"), col("source"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => t.isInCollection(qcStopwords))).as("n_stop"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("source"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("q_score"))
    val cutoffs = scored.groupBy("source")
      .agg(round(percentile(col("q_score"), lit(floor)), 6).as("cutoff"))
    scored.join(broadcast(cutoffs), "source")
      .filter(col("q_score") >= col("cutoff"))
      .select(col("doc_id"), col("source"), col("q_score"), col("cutoff"))
  }

  /** CORRECTNESS instantiation: drop each source's bottom quintile. */
  def calibratedQualityFilter(spark: SparkSession, dir: String,
      floor: Double = 0.2): DataFrame =
    calibratedQualityFloor(Tables.load(spark, dir, "documents"), floor)

  /** CURRICULUM data ordering (Bengio et al. 2009 — public): order
    * training documents easy → hard in `nPhases` quality phases, with a
    * DETERMINISTIC within-phase shuffle, the reproducible data-ordering
    * recipe a curriculum-trained run needs (order is a pure function of
    * (seed, id) — `rand()` reproduces across nothing). Difficulty
    * signal: the house stopword-ratio quality score (higher = cleaner =
    * earlier phase); phase boundaries are exact per-corpus quantile
    * cutoffs.
    *
    * Scale shape: the phase cutoffs are a two-phase exact `percentile`
    * aggregate collected as nPhases−1 plan literals (the
    * [[calibratedQualityFloor]] discipline — a global ntile window
    * would total-sort the corpus in one task); score and cutoffs are
    * 6-dp rounded before the compare so a boundary row can't flip
    * cross-engine. The within-phase SEQUENCE is the
    * [[Relational.deterministicShuffle]] device per phase, in one pass:
    * the 32-bit shuffle key range-buckets by its high bits, per-(phase,
    * bucket) ranks come from slice-local windows, and (phase, bucket)
    * offsets re-enter as one dense driver-side literal (≤
    * nPhases·buckets longs — the bounded-collect class). seq ≡
    * `row_number() OVER (PARTITION BY phase ORDER BY key, id) − 1` with
    * the work of a bucketed sort. Zero-token documents are dropped (no
    * score — the calibrated-floor rule). */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      nPhases: Int = 3, seed: String = "curriculum0",
      buckets: Int = 1024): DataFrame = {
    val toks = tokens(col(textCol))
    curriculumOrderFromScores(docs
      .select(col(idCol).as("doc_id"), size(toks).as("n_tokens"),
        size(filter(toks, t => t.isInCollection(qcStopwords))).as("n_stop"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6).as("q_score")),
      nPhases, seed, buckets)
  }

  /** The 24-byte/doc metadata projection a curriculum-layout maintainer
    * lands as documents arrive — (doc_id, n, q_score) for every
    * scoreable (n > 0) document; [[curriculumOrderFromScores]] +
    * [[Packing.curriculumBlocksFromState]] re-derive the entire
    * ordering and block layout from it without re-reading text. */
  def curriculumStateRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(toks).as("nt"),
        size(filter(toks, t => t.isInCollection(qcStopwords))).as("ns"))
      .filter(col("nt") > 0)
      .select(col("doc_id"), col("nt").cast("long").as("n"),
        round(col("ns").cast("double") / col("nt"), 6).as("q_score"))
  }

  /** [[curriculumOrder]] over PRE-SCORED (doc_id, q_score) rows — the
    * entry a metadata serve uses: the ordering is a pure function of
    * the score table (cutoffs, phases, shuffle keys, rank offsets all
    * derive from it), so a maintainer that lands the row-local quality
    * score as documents arrive can re-derive the ENTIRE curriculum at
    * any phase count without re-reading text. */
  def curriculumOrderFromScores(scores: DataFrame, nPhases: Int = 3,
      seed: String = "curriculum0", buckets: Int = 1024): DataFrame = {
    require(nPhases >= 2, "a curriculum needs at least two phases")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      "buckets must be a power of two (range-aligned key prefix), bounded")
    // pinned: three consumers (cutoff aggregate, bucket counts, the
    // ranked result) would each re-run the scoring input over the
    // corpus; the materialized (id, score) projection is 16 bytes/doc —
    // the cheap side of that trade at any SF (curriculum ordering runs
    // once per training run, not per epoch, so the localCheckpoint
    // blocks don't accumulate the way a per-epoch reshuffle's would —
    // the deterministicShuffle trade goes the other way for exactly
    // that reason)
    val scored = scores.select(col("doc_id"), col("q_score"))
      .localCheckpoint()
    // nPhases−1 cutoffs, descending quantiles → ascending phase number
    // (phase 0 = top quality slice)
    val cutRow = scored.agg(
      round(percentile(col("q_score"), lit((nPhases - 1).toDouble / nPhases)), 6)
        .as("c0"),
      (1 until nPhases - 1).map(i =>
        round(percentile(col("q_score"),
          lit((nPhases - 1 - i).toDouble / nPhases)), 6).as(s"c$i")): _*)
      .head()
    val cuts = (0 until nPhases - 1).map(i => cutRow.getDouble(i))
    val phase = cuts.zipWithIndex.foldRight(lit((nPhases - 1).toLong)) {
      case ((c, i), acc) => when(col("q_score") >= c, lit(i.toLong)).otherwise(acc)
    }
    val key = GraftFunctions.md5Prefix32(
      concat(lit(seed), lit(":"), col("doc_id").cast("string")))
    val perBucket = (1L << 32) / buckets
    val withB = scored
      .select(col("doc_id"), col("q_score"), phase.as("phase"), key.as("__k"))
      .withColumn("__b", (col("__k") / lit(perBucket)).cast("long"))
    // (phase, bucket) offsets — dense driver-side literal (the
    // deterministicShuffle rationale verbatim; nPhases·buckets longs)
    val counts = withB.groupBy("phase", "__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val dense = new Array[Long](nPhases * buckets)
    var ci = 0
    var p = 0
    while (p < nPhases) {
      var run = 0L
      var b = 0
      while (b < buckets) {
        dense(p * buckets + b) = run
        if (ci < counts.length && counts(ci)._1 == p && counts(ci)._2 == b) {
          run += counts(ci)._3; ci += 1
        }
        b += 1
      }
      p += 1
    }
    import org.apache.spark.sql.expressions.Window
    withB
      .withColumn("__r", row_number().over(
        Window.partitionBy("phase", "__b").orderBy(col("__k"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("phase"), col("q_score"),
        (element_at(typedlit(dense.toSeq),
          (col("phase") * buckets + col("__b") + 1).cast("int")) +
          col("__r") - 1).as("seq"))
  }

  /** CORRECTNESS instantiation: 3-phase curriculum over documents at
    * the epoch-0 curriculum seed. */
  def curriculumDocs(spark: SparkSession, dir: String): DataFrame =
    curriculumOrder(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** Hybrid retrieval — reciprocal-rank fusion of the lexical ([[bm25Rank]])
    * and dense ([[Similarity.topKCosine]]) rankings, the standard published
    * recipe for combining incomparable score scales (RRF: score is
    * Σ 1/(k₀ + rank), rank-only, so BM25 log-scores and cosine similarities
    * never need calibration against each other).
    *
    * Scale shape: both branches end in their own bounded k-cut (per-task
    * heap / partial-merge topk_by) BEFORE fusion, so the rank windows and
    * the full-outer fusion join run over ≤ `depth` rows per branch —
    * driver-scale constants, not corpus relations; the single-partition
    * rank windows are bounded by construction (the k-cut above them).
    * The corpus-scale work is exactly the two retrieval plans, unchanged.
    * A doc missing from one branch's top-`depth` contributes 0 from that
    * branch (union-of-top-k fusion — the published form). */
  def hybridSearch(docs: DataFrame, emb: DataFrame, idCol: String,
      textCol: String, query: Seq[String], queryVecId: Long,
      depth: Int = 50, k: Int = 25, k0: Int = 60): DataFrame = {
    val lex = bm25Rank(docs, idCol, textCol, query, depth)
      .select(col(idCol).as("doc_id"), col("score"))
    val queries = emb.filter(col("vec_id") === queryVecId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val dense = Similarity.topKCosine(emb, queries, depth)
      .select(col("vec_id").as("doc_id"), col("score"))
    rrfFuse(lex, dense, k, k0)
  }

  /** The RRF fusion tail of [[hybridSearch]], reusable over any pair of
    * ranked branches (the streamed composer
    * [[graft.streaming.StreamHybrid]] feeds it from its landed indexes):
    * both inputs are (doc_id, score) top-`depth` cuts; ranks are
    * re-derived with the shared (score DESC, doc_id) tie-break, so
    * fusion depends only on each branch's ANSWER, not on how it was
    * served. The single-partition rank windows are bounded by the
    * branches' k-cuts above them. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, k: Int, k0: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lexR = lex.select(col("doc_id"),
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .as("r_lex"))
    val denseR = dense.select(col("doc_id"),
      row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
        .as("r_dense"))
    lexR.join(denseR, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        // lex + dense, in this order — the oracle mirrors the association
        round(coalesce(lit(1.0) / (lit(k0) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(k0) + col("r_dense")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** CORRECTNESS instantiation: [[searchQuery]] fused with the
    * neighborhood of embedding vec 0 (vec_id ≡ doc_id in the synthetic
    * corpus — the retrieval pair every RAG stack maintains). */
  def hybridDocs(spark: SparkSession, dir: String): DataFrame =
    hybridSearch(Tables.load(spark, dir, "documents"),
      Tables.load(spark, dir, "embeddings"),
      "doc_id", "text", searchQuery, queryVecId = 0L)

  /** INDEX-BACKED hybrid retrieval — [[hybridSearch]] with the dense leg
    * served from a compressed IVF-PQ index instead of an exact O(corpus)
    * cosine scan per query: stage 1 widens the pruned ADC cut to
    * r·depth candidates, stage 2 re-ranks JUST those on their exact
    * embeddings ([[Similarity.refinedSearchIndex]] — the
    * `sim_topk_refine_landed` serve), and the top-`depth` re-ranked
    * neighbors fuse with the lexical branch through the same
    * [[rrfFuse]]. This is the serve shape a RAG stack runs at 100 TB:
    * the ONLY corpus-linear retrieval path left in the batch composer
    * (`hybridSearch`'s exact dense leg) becomes probed-inverted-lists +
    * a bounded re-rank, so per-query dense cost tracks nprobe/|cells|
    * of the CODE table (m bytes/vector) plus |Q|·r·depth full-vector
    * fetches — never a full embedding scan. The answer is approximate
    * exactly where the ADC cut is (a true neighbor outside the probed
    * cells or below the r·depth cut is missed); recall vs the exact
    * leg is monitored by the same annRecall harness the plain serves
    * use.
    *
    * Takes the prebuilt code `index` + fixed quantizers so the landed
    * ([[hybridDocsSteady]]) and streamed
    * ([[graft.streaming.StreamHybrid.searchSteady]]) serves share one
    * composer with the from-scratch spec form. */
  def hybridSearchCompressed(docs: DataFrame, emb: DataFrame,
      index: DataFrame, centroids: DataFrame,
      book: Seq[(Int, Int, Array[Double])], idCol: String, textCol: String,
      query: Seq[String], queryVecId: Long, depth: Int = 50, k: Int = 25,
      k0: Int = 60, r: Int = 4, nprobe: Int = 4, m: Int = 8,
      subDim: Int = 8): DataFrame = {
    val lex = bm25Rank(docs, idCol, textCol, query, depth)
      .select(col(idCol).as("doc_id"), col("score"))
    val queries = emb.filter(col("vec_id") === queryVecId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val dense = Similarity.refinedSearchIndex(emb, index, queries,
        depth, r, nprobe, m, subDim, centroids, book)
      .select(col("vec_id").as("doc_id"), col("score"))
    rrfFuse(lex, dense, k, k0)
  }

  /** STEADY-STATE [[hybridDocs]] — both branches off LANDED indexes:
    * the lexical leg from the bucket-pruned inverted index
    * ([[bm25RankIndexed]], the `txt_bm25_steady` serve), the dense leg
    * from the cell-bucketed landed IVF-PQ code table through the
    * refined two-stage serve ([[Similarity.ensureIvfPqCodes]] +
    * [[Similarity.refinedSearchIndex]] — the `sim_topk_refine_landed`
    * serve). No tokenize, no training, no encode, and NO corpus-linear
    * scan anywhere in the timed plan: per-query cost is
    * postings-of-query-terms + probed inverted code lists + a bounded
    * exact re-rank. The oracle replays the approximate dense branch
    * exactly (trained quantizers + ADC + refine in SQL — the
    * `sim_topk_ivfpq_*` house style) fused with the lexical replay. */
  def hybridDocsSteady(spark: SparkSession, dir: String,
      depth: Int = 50, k: Int = 25, k0: Int = 60, r: Int = 4): DataFrame = {
    ensureSearchIndex(spark, dir)
    val emb = Tables.load(spark, dir, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val (centDf, book) = Similarity.loadLandedQuantizers(spark, dir)
    val codes = Similarity.ensureIvfPqCodes(spark, dir)
    // the lexical top-depth cut and the dense leg's eager probe/refine
    // collects are INDEPENDENT job chains — overlap them (guide §2.6 via
    // [[Similarity.overlapJobs]]; the r17 verdict ask). The lex leg pins
    // its ≤ depth-row cut (bounded by the k-cut above it) so the fusion
    // tail reads a materialized leaf; both legs' values are unchanged.
    val (lex, dense) = Similarity.overlapJobs(spark)(
      bm25RankIndexed(spark, searchIndexPrefix(dir), searchQuery, k = depth)
        .select(col("doc_id"), col("score")).localCheckpoint()) {
      Similarity.refinedSearchIndex(emb, codes, queries, depth, r,
          nprobe = 4, m = 8, subDim = 8, centDf, book)
        .select(col("vec_id").as("doc_id"), col("score"))
    }
    rrfFuse(lex, dense, k, k0)
  }

  /** Pseudo-relevance-feedback query expansion (the RM3/Rocchio device —
    * public IR): run the base BM25 query, treat its top `fb` documents
    * as the relevance model, add the `e` most frequent NON-query terms
    * of that feedback set (occurrence count DESC, term ASC — fully
    * deterministic), and re-rank with the expanded query — the standard
    * recall lift for short queries, with no model anywhere.
    *
    * Scale shape: pass 1 is the audited BM25 plan cut to `fb` rows; the
    * feedback-term count joins the BOUNDED top-doc set broadcast into
    * the corpus tokenize (one scan), and the `e` expansion terms are a
    * bounded collect (the probe-set legitimacy class — they become
    * scan-side literals of pass 2, which is the same BM25 plan over
    * |Q|+e terms). Two corpus scans total — what PRF costs anywhere. */
  def bm25Prf(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], fb: Int = 10, e: Int = 5, k: Int = 25): DataFrame = {
    val top = bm25Rank(docs, idCol, textCol, query, fb).select(col(idCol))
    val expanded = docs.join(broadcast(top), idCol)
      .select(explode(tokens(col(textCol))).as("term"))
      .filter(!col("term").isin(query: _*))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(e)
      .collect().map(_.getString(0)).toSeq
    bm25Rank(docs, idCol, textCol, query ++ expanded, k)
  }

  /** CORRECTNESS instantiation: [[searchQuery]] expanded by the top 5
    * feedback terms of its top 10 documents. */
  def bm25PrfDocs(spark: SparkSession, dir: String): DataFrame =
    bm25Prf(Tables.load(spark, dir, "documents"), "doc_id", "text", searchQuery)

  /** STEADY-STATE [[bm25Prf]] — PRF with ZERO corpus scans, the form a
    * serving system actually runs: pass 1 serves from the landed
    * bucket-pruned inverted index ([[bm25RankIndexed]]), the fb feedback
    * documents' text is fetched through a pushed-down literal id filter
    * (fb rows out of the corpus — parquet row-group pruning), their
    * expansion terms counted over that bounded set, and pass 2 serves
    * from the same index over |Q|+e terms. Same answer, same oracle as
    * the direct entry (the txt_bm25_steady landed ≡ direct law, applied
    * twice). */
  def bm25PrfSteady(spark: SparkSession, dir: String, fb: Int = 10,
      e: Int = 5, k: Int = 25): DataFrame = {
    ensureSearchIndex(spark, dir)
    val prefix = searchIndexPrefix(dir)
    val topIds = bm25RankIndexed(spark, prefix, searchQuery, fb)
      .select(col("doc_id").cast("long"))
      .collect().map(_.getLong(0)).toSeq.sorted
    val expanded = Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isin(topIds: _*))
      .select(explode(tokens(col("text"))).as("term"))
      .filter(!col("term").isin(searchQuery: _*))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(e)
      .collect().map(_.getString(0)).toSeq
    bm25RankIndexed(spark, prefix, searchQuery ++ expanded, k)
  }

  /** VOCABULARY coverage curve — the tokenizer-design audit behind every
    * vocab-size decision (public practice: rank terms by corpus
    * frequency, read off what share of all token OCCURRENCES the top-k
    * types cover; the knee of this curve is where a bigger vocab stops
    * paying): for each k in `ks`, the covered mass and its share of the
    * corpus.
    *
    * Scale shape: term counts are a two-phase aggregate (one row per
    * TYPE crosses); the curve needs only the top max(ks) types, a
    * bounded `TakeOrderedAndProject` — the full vocabulary never sorts
    * globally (the deterministicShuffle lesson applies only when the
    * whole ranking must land; a fixed-k curve doesn't) — and each
    * surviving type fans out row-locally to the ks that cover it.
    * Ties rank by term ascending (deterministic cross-engine). */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
      ks: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(ks.nonEmpty && ks.forall(_ > 0))
    val counts = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val ranked = counts.orderBy(col("n").desc, col("term").asc).limit(ks.max)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("term").asc)))
    ranked
      .withColumn("k", explode(filter(
        array(ks.map(lit(_)).toIndexedSeq: _*), k => k >= col("rank"))))
      .groupBy("k").agg(sum(col("n")).as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("total"),
        round(col("covered").cast("double") / col("total"), 6).as("share"))
  }

  /** CORRECTNESS instantiation: the curve at k ∈ {5, 10, 20, 40} — the
    * fixture vocabulary saturates inside the range, so both the binding
    * and the saturated regimes are exercised. */
  def vocabCoverageDocs(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.load(spark, dir, "documents"), "doc_id", "text",
      Seq(5, 10, 20, 40))

  /** PER-SOURCE quota capping — the per-domain cap the public web-corpus
    * recipes apply before any mixing (RefinedWeb's and CCNet's
    * domain-balance step): no single source may contribute more than
    * `cap` documents, whatever its raw size, so a crawl dominated by one
    * boilerplate-heavy domain cannot dominate the training mix. The
    * DOCUMENT-count complement of `txt_budget_mix`'s token budgeting —
    * the two compose (cap first, then budget tokens).
    *
    * The within-source pick is the deterministic md5 draw (the
    * stratifiedSample / clusterSample device — reproducible across runs,
    * engines, and partitionings, stable under corpus growth for the
    * retained ids). Scale shape: the per-source cut runs through
    * TopKPerKey's bounded partial heaps BEFORE the exchange — at most
    * `cap` rows per source per partition cross, never the corpus. */
  def sourceCap(docs: DataFrame, cap: Int): DataFrame =
    graft.plans.TopKPerKey(
      docs.select(col("doc_id"), col("source"))
        .withColumn("h", md5(col("doc_id").cast("string"))),
      Seq("source"), Seq(col("h").asc, col("doc_id").asc), cap)
      .select("source", "doc_id")

  /** CORRECTNESS instantiation: at most 15 documents per source —
    * below the uniform per-source count at every test SF, so the cap
    * BINDS (a non-binding cap checks nothing). */
  def sourceCapDocs(spark: SparkSession, dir: String, cap: Int = 15): DataFrame =
    sourceCap(Tables.load(spark, dir, "documents"), cap)

  /** Source-level (domain-level) quality filtering — the coarse sibling of
    * the per-document [[qualityFilter]], after the public web-corpus
    * practice of dropping entire domains whose aggregate quality is poor
    * (boilerplate farms, SEO spam) rather than adjudicating their
    * documents one by one: score each source by its mean per-document
    * stopword ratio (the strongest single natural-language signal in the
    * quality family) and keep every document of every source at or above
    * the floor.
    *
    * Scale shape: the per-doc ratio is a scan-side codegen projection; the
    * source score is a two-phase aggregate moving ONE row per source; the
    * keep set (≤ |sources| rows) broadcasts back onto the same projection
    * — the corpus is read once and never shuffles. Division guards
    * `greatest(n_tokens, 1)` so empty documents score 0 instead of NaN
    * (NaN compares greater than any double in Spark — an empty-doc source
    * must not pass the floor through NaN poisoning). */
  def sourceQualityFilter(docs: DataFrame, minStopRatio: Double = 0.06): DataFrame = {
    val toks = tokens(col("text"))
    val perDoc = docs.select(
      col("doc_id"), col("source"),
      (size(filter(toks, t => t.isInCollection(qcStopwords))).cast("double") /
        greatest(size(toks), lit(1))).as("__r"))
    val kept = perDoc.groupBy("source")
      .agg(avg(col("__r")).as("__score"))
      .filter(col("__score") >= minStopRatio)
      .select("source")
    perDoc.join(broadcast(kept), Seq("source"))
      .select("doc_id", "source")
  }

  /** CORRECTNESS instantiation: the 0.06 floor splits the sf0.01 sources
    * (per-source means span 0.039–0.076) with ≥ 3.5e-5 margin to the
    * nearest source — ~10 orders beyond cross-engine summation-order
    * drift on a 25-term mean. */
  def sourceFiltered(spark: SparkSession, dir: String): DataFrame =
    sourceQualityFilter(Tables.load(spark, dir, "documents"))

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
    * The corpus is read once and never shuffles.
    *
    * Contract: rows with a NULL `groupCol` are dropped (the rate join
    * never matches NULL keys — identically in the DuckDB oracle);
    * pre-coalesce NULLs to a sentinel group if they must participate. */
  def temperatureMix(docs: DataFrame, groupCol: String, idCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(groupCol),
        round(pow(col("__n").cast("double") / col("__n_min"), lit(alpha - 1)), 9)
          .as("__rate"))
    val u = GraftFunctions.md5Uniform(col(idCol).cast("string"))
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

  /** Unicode-normalized content fingerprints (E210 — the CCNet/C4
    * normalize-before-hash step): every byte-keyed signature in the dedup
    * family (MD5 content keys, shingles, MinHash) treats composed é and
    * decomposed e+COMBINING ACUTE as DIFFERENT documents; fingerprinting
    * `nfc_norm(text)` instead of the raw bytes makes spelling-form
    * variants of the same text collide, which is the correct dedup key.
    * Pure scan-side codegen (the `nfc_norm` expression's fast path does
    * not even allocate on already-normalized text — the overwhelming
    * case): zero shuffles, zero joins at any corpus size.
    *
    * The synthetic corpus is pure ASCII (NFC-trivially), so the entry
    * PLANTS decomposed-form docs (the plantedNearDocs discipline — an
    * unplanted oracle would be vacuously green): every 10th doc gains a
    * shifted-id copy suffixed with combining-mark spellings; `changed`
    * must read true exactly on the planted rows, and the DuckDB oracle
    * recomputes the same normalization with `nfc_normalize`. */
  def normalizeFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          // DECOMPOSED spellings (e/u + combining mark) as explicit escapes
          // — NFC composes them, so `changed` reads true on these rows
          concat(col("text"), lit(" cafe\u0301 u\u0308ber")).as("text")))
    val norm = GraftFunctions.nfcNorm(col("text"))
    planted.select(col("doc_id"),
      md5(norm.cast("binary")).as("fp"),
      (norm =!= col("text")).as("changed"))
  }

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

  /** Per-document top-k keywords by TF-IDF — the tagging op a corpus
    * consumer runs after [[termStats]]: tf(doc, term)·idf(term), k best
    * per document, ties broken on term ascending (deterministic
    * cross-engine). Composed through the custom TopKPerKey physical
    * operator, so the per-doc cut happens in bounded partial heaps
    * BEFORE the exchange — the window spelling would shuffle AND sort
    * every (doc, term) row to keep 3 of them. Scale shape: explode is
    * row-local; (doc, term) tf is a two-phase count; idf derives from tf
    * model-sized; the only corpus-scale exchange carries TopKPerKey's
    * bounded per-key output. */
  def docKeywords(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"),
        round(log(col("n_docs").cast("double") / col("df")), 6).as("idf"))
    val scored = tf.join(idf, "term")
      .select(col("doc_id"), col("term"),
        round(col("tf") * col("idf"), 6).as("score"))
    graft.plans.TopKPerKey(scored, Seq("doc_id"),
      Seq(col("score").desc, col("term").asc), k)
  }

  /** PII patterns: plain character classes + `\b` + the `(?i)` flag only,
    * so Java (Spark) and RE2 (DuckDB oracle) regex dialects agree
    * exactly — and Mixed.Case@Example.COM addresses still redact.
    * Deliberately the standard public shapes (email; NANP 555 test-range
    * phone), not a trained recognizer — the operator is the scan/redact
    * plumbing. */
  val emailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\b555-[0-9]{4}\\b"

  /** PII scan + redaction — the privacy pass a training-data pipeline
    * runs before any text leaves the raw zone: count pattern hits per
    * document and emit the redacted text's fingerprint (placeholder
    * substitution, `<EMAIL>` / `<PHONE>`). Pure scan-side codegen'd
    * projection: patterns compile once per task, no shuffle, no state;
    * the redacted body would be written straight back to a landed zone at
    * 100 TB — here its md5 + length stand in so the result stays
    * hash-comparable. */
  /** Placeholder redaction of every PII pattern hit — the column form,
    * for applying in-line in a landing pipeline ([[graft.PrepJob]]). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = redactPii(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(emailPattern)).as("n_emails"),
      regexp_count(col(textCol), lit(phonePattern)).as("n_phones"),
      length(redacted).as("redacted_chars"),
      md5(redacted).as("redacted_md5"))
  }

  /** CORRECTNESS instantiation: the synthetic corpus contains no natural
    * PII, so contact lines are planted by construction — doc_id % 3 = 0
    * gains an email, % 3 = 1 an email and a phone, % 3 = 2 stays clean
    * (the zero-hit path is exercised, not vacuous). */
  def piiDocs(spark: SparkSession, dir: String): DataFrame = {
    val contact = concat(lit(" contact user"), col("doc_id"),
      lit("@example.com"))
    val phone = concat(lit(" or 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    val planted = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, concat(col("text"), contact))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(col("text"), contact, phone))
          .otherwise(col("text")).as("text"))
    piiScan(planted, "doc_id", "text")
  }

  /** Repetition / boilerplate scoring — the within-document duplication
    * signals of the public quality-filtering literature (Gopher-style
    * "repetitious text" rules): per document, the fraction of bigram
    * occurrences taken by the single most frequent bigram (`top_frac`)
    * and the fraction that are repeats of an earlier bigram
    * (`dup_frac`). High values mean boilerplate, chart spam, or
    * degenerate generation loops.
    *
    * Scale shape: entirely ROW-LOCAL — every bigram of a document lives
    * in the document's own row, so per-doc counting needs no exchange at
    * all: hash each bigram (8 bytes, never the strings —
    * hash-for-string equality w.h.p., same argument as
    * dedup_minhash_lsh), sort the per-doc hash array, and fold the runs
    * in one pass with a higher-order `aggregate`. Zero shuffles at any
    * corpus size (the explode + two-level groupBy alternative re-keys
    * the corpus's every bigram by doc just to rediscover this locality —
    * measured 8.1 s vs 0.8 s at sf0.1). Documents with fewer than 2
    * tokens have no bigrams and drop out. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // staged projections so the tokenizer / token-hash / bigram-hash
    // arrays each materialize once (CollapseProject won't inline a
    // non-cheap alias referenced more than once); bigram identity is
    // xxhash64(token-hash pair) — no per-bigram string ever allocates
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), transform(col("w"), t => xxhash64(t)).as("th"))
    val sortedBh = array_sort(transform(sequence(lit(1), size(col("th")) - 1),
      i => xxhash64(element_at(col("th"), i), element_at(col("th"), i + 1))))
    // run-length fold over the sorted hashes: (prev, run, best, nd);
    // nd = 0 marks "no element seen yet" so no sentinel hash is needed
    val folded = aggregate(
      col("bh"),
      struct(lit(0L).as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit(0L).as("nd")),
      (acc, x) => {
        val same = acc.getField("nd") > 0 && x === acc.getField("prev")
        val run = when(same, acc.getField("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("nd") + when(same, lit(0L)).otherwise(lit(1L))).as("nd"))
      })
    toks
      .select(col("doc_id"), sortedBh.as("bh"))
      .select(col("doc_id"), size(col("bh")).cast("long").as("n_bigrams"),
        folded.as("f"))
      .select(col("doc_id"), col("n_bigrams"),
        col("f.nd").as("n_distinct"),
        round(col("f.best").cast("double") / col("n_bigrams"), 6).as("top_frac"),
        round(lit(1.0) - col("f.nd").cast("double") / col("n_bigrams"), 6)
          .as("dup_frac"))
  }

  /** CORRECTNESS instantiation over documents (the 30-ish-word synthetic
    * vocabulary repeats bigrams naturally — non-vacuous without planting). */
  def repetitionDocs(spark: SparkSession, dir: String): DataFrame =
    repetitionStats(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** CROSS-document boilerplate removal — the corpus-level sibling of
    * [[repetitionStats]]'s within-document signals, after the published
    * web-pipeline recipe (CCNet / RefinedWeb line-dedup): a text segment
    * that recurs verbatim across many distinct documents is template
    * chrome (nav bars, footers, cookie banners), not content, and should
    * be stripped from every document rather than used to judge any of
    * them. With no line structure in the corpus, the segment unit is a
    * fixed `window`-token slice (the final partial slice included), and
    * a segment is boilerplate when ≥ `minDocs` DISTINCT documents
    * contain it.
    *
    * Scale shape: the segment census never carries text — each slice is
    * md5'd SCAN-SIDE and only (doc_id, seg_idx, h) crosses the explode,
    * so the distinct-doc count is a two-phase aggregate over 32-byte
    * keys and the survivors' shuffle rows are three scalars. The
    * boilerplate catalog (segments in ≥ minDocs docs) is bounded by
    * corpus REDUNDANCY, not corpus size — template-chrome-catalog-sized
    * — and broadcasts to an exchange-free anti-join against the segment
    * rows. Reconstruction collects each doc's surviving seg_idx ints
    * (narrow shuffle), and the document text rides exactly ONE doc_id
    * equi-join (the E113 chunk-text discipline) where the slices are
    * re-cut from the token array scan-side. A document whose every
    * segment is boilerplate — or with zero tokens — still emits a row
    * with empty clean_text, restored by the final left join.
    *
    * Output: (doc_id, clean_text, n_kept, n_dropped). */
  def boilerplateStrip(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, minDocs: Int = 3): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_segs",
        ceil(col("n").cast("double") / window).cast("long"))
    // (doc_id, seg_idx, h) only — the slice text dies inside the md5
    val segs = base.select(col("doc_id"), col("toks"),
        explode(when(col("n") > 0,
            sequence(lit(0L), col("n_segs") - 1))
          .otherwise(array().cast("array<bigint>"))).as("seg_idx"))
      .select(col("doc_id"), col("seg_idx"),
        md5(array_join(slice(col("toks"),
          (col("seg_idx") * window + 1).cast("int"), lit(window)), " ")).as("h"))
    val boiler = segs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("h")
    val keptIdx = segs.join(broadcast(boiler), Seq("h"), "left_anti")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("seg_idx"))).as("ki"))
    base.join(keptIdx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(array_join(flatten(transform(col("ki"),
          i => slice(col("toks"), (i * window + 1).cast("int"), lit(window)))),
          " "), lit("")).as("clean_text"),
        coalesce(size(col("ki")).cast("long"), lit(0L)).as("n_kept"),
        (col("n_segs") - coalesce(size(col("ki")).cast("long"), lit(0L)))
          .as("n_dropped"))
  }

  /** CORRECTNESS instantiation: 8-token segments shared by ≥ 3 docs
    * (the synthetic 30-ish-word vocabulary repeats 8-token runs
    * naturally — 17 boilerplate segments at sf0.01, non-vacuous without
    * planting). */
  def boilerplateDocs(spark: SparkSession, dir: String): DataFrame =
    boilerplateStrip(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** Per-source DISTINCTIVE terms — corpus keyness by Dunning's
    * log-likelihood ratio (the published G² statistic of corpus
    * linguistics; the standard "what characterizes this domain" report a
    * mixing policy is built from): for each (source, term), compare the
    * term's in-source count `a` against its rest-of-corpus count under
    * the null of one shared distribution, G² = 2·(a·ln(a/E₁) +
    * b·ln(b/E₂)) with E₁ = tt·stot/N, E₂ = tt·(N−stot)/N; only
    * positively-key terms (relative frequency ABOVE the corpus rate)
    * rank, and the k-cut per source runs through TopKPerKey's bounded
    * pre-exchange heaps (the docKeywords discipline).
    *
    * Scale shape: one row-local explode, a (source, term) two-phase
    * count, and the marginals all DERIVE from that model-sized table —
    * term totals join back on the same term key (exchange-reusable),
    * source totals and the grand total ride tiny broadcasts; the G² math
    * is scan-side. Counts multiply as DOUBLES (two 100 TB-scale token
    * totals overflow int64 as a product), in an association order
    * mirrored exactly in the oracle, and the score is 6-dp rounded
    * BEFORE ranking (the bigram-LM discipline) with ties on term
    * ascending. b = 0 (term exclusive to the source) contributes 0 by
    * the x·ln x → 0 limit. */
  def keyTerms(docs: DataFrame, srcCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val st = docs
      .select(col(srcCol).as("source"), explode(tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("a"))
    val termTot = st.groupBy("term").agg(sum(col("a")).as("tt"))
    val srcTot = st.groupBy("source").agg(sum(col("a")).as("stot"))
    val n = st.agg(sum(col("a")).as("n"))
    val aD = col("a").cast("double")
    val ttD = col("tt").cast("double")
    val stotD = col("stot").cast("double")
    val nD = col("n").cast("double")
    val e1 = ttD * stotD / nD
    val e2 = ttD * (nD - stotD) / nD
    val bD = (col("tt") - col("a")).cast("double")
    val scored = st.join(termTot, "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(n))
      .filter(aD * nD > ttD * stotD)
      .select(col("source"), col("term"), col("a").as("n_src"),
        round(lit(2.0) * (aD * log(aD / e1) +
          when(col("tt") === col("a"), lit(0.0))
            .otherwise(bD * log(bD / e2))), 6).as("g2"))
    graft.plans.TopKPerKey(scored, Seq("source"),
      Seq(col("g2").desc, col("term").asc), k)
  }

  /** CORRECTNESS instantiation: top 5 key terms per source. */
  def keyTermsDocs(spark: SparkSession, dir: String): DataFrame =
    keyTerms(Tables.load(spark, dir, "documents"), "source", "text")

  /** PMI collocation mining — the published pointwise-mutual-information
    * bigram association measure (Church & Hanks, CL'90: the standard
    * "which word pairs co-occur far above chance" report; the phrase
    * inventory word2vec-style phrase merging and tokenizer-vocab audits
    * are built from). [[keyTerms]]'s ADJACENCY complement: keyness ranks
    * term-vs-SOURCE association, PMI ranks term-vs-NEXT-TERM association
    * — pmi(a,b) = ln(p(ab) / (p(a)·p(b))) over adjacent-pair and
    * unigram occurrence distributions, with a `minCount` floor (raw PMI
    * notoriously promotes hapax pairs — the floor is Church & Hanks'
    * own remedy) and the global top-k cut.
    *
    * Scale shape: ONE pass over text — each token zips with its
    * successor (null for the last, a row-local slice+concat), so the
    * single exploded projection carries BOTH distributions: bigram
    * counts are the (w1, w2≠null) aggregate and unigram counts DERIVE
    * from the same model-sized pair table (Σ over w2, no second text
    * scan — the [[keyTerms]] marginals discipline). Counts multiply as
    * doubles in an association order mirrored exactly in the oracle,
    * 6-dp rounded BEFORE ranking with (w1, w2) ascending ties, and the
    * k-cut is a TakeOrdered — |vocab²|-bounded model rows, never text,
    * cross the exchanges. */
  def collocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 50): DataFrame =
    collocationsFromPairs(collocationPairRows(docs, textCol), minCount, k)

  /** The ADDITIVE (w1, w2, c) pair-count aggregate both distributions
    * derive from — additive over any partition of the corpus into
    * batches (pair counts are per-document sums), so a maintainer can
    * land one generation per arrival batch and the report serves off
    * the summed state without ever re-reading text. */
  def collocationPairRows(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(tokens(coalesce(col(textCol), lit(""))).as("t"))
      .filter(size(col("t")) >= 1)
      .withColumn("nx", concat(slice(col("t"), lit(2), size(col("t")) - 1),
        array(lit(null).cast("string"))))
      .select(explode(arrays_zip(col("t"), col("nx"))).as("p"))
      .groupBy(col("p.t").as("w1"), col("p.nx").as("w2"))
      .agg(count(lit(1)).as("c"))

  /** The PMI rank over a pair-count table ([[collocationPairRows]], or
    * the summed union of landed generations of it). */
  def collocationsFromPairs(pairs: DataFrame,
      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val uni = pairs.groupBy(col("w1").as("w")).agg(sum(col("c")).as("n"))
    val big = pairs.filter(col("w2").isNotNull)
      .select(col("w1"), col("w2"), col("c").as("n_pair"))
    val tot = uni.agg(sum(col("n")).cast("double").as("tn"))
    val btot = big.agg(sum(col("n_pair")).cast("double").as("tb"))
    big
      .join(uni.select(col("w").as("w1"), col("n").as("n1")), "w1")
      .join(uni.select(col("w").as("w2"), col("n").as("n2")), "w2")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(log(col("n_pair").cast("double") * col("tn") * col("tn")
          / (col("tb") * col("n1").cast("double") * col("n2").cast("double"))),
          6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** CORRECTNESS instantiation: top-50 collocations, 5-occurrence
    * floor, over the documents table. */
  def collocationsDocs(spark: SparkSession, dir: String): DataFrame =
    collocations(Tables.load(spark, dir, "documents"), "text")

  /** STEADY form for `txt_collocations_steady`: the PMI report off
    * LANDED additive pair-count generations (two doc-parity splits —
    * the shape a maintainer accumulates per batch, summed at serve).
    * Shares the batch oracle: pair counts are additive over any
    * batch partition of the corpus, so where they came from is
    * invisible — the report never re-reads text. */
  def collocationsSteadyDocs(spark: SparkSession, dir: String): DataFrame = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val path = graft.sources.Landing.ensureDir(spark,
      s"colloc_steady_$suffix") { p =>
      val docs = Tables.load(spark, dir, "documents")
      collocationPairRows(docs.filter(col("doc_id") % 2 === 0), "text")
        .write.parquet(s"$p/gen-0")
      collocationPairRows(docs.filter(col("doc_id") % 2 === 1), "text")
        .write.parquet(s"$p/gen-1")
    }
    collocationsFromPairs(
      spark.read.parquet(s"$path/gen-0")
        .unionByName(spark.read.parquet(s"$path/gen-1"))
        .groupBy("w1", "w2").agg(sum(col("c")).as("c")))
  }

  /** Feature-hashed document vectors (the hashing trick — the published
    * fastText/Vowpal-Wabbit device): every token hashes into one of
    * `dims` lanes via the cross-engine 32-bit md5 prefix, lane values
    * are term counts, and the vector is L2-normalized — text becomes an
    * `Array[Double]` embedding with NO trained model, which is exactly
    * the bridge that lets the ANN / SemDedup / k-means stack run over a
    * raw TEXT corpus end to end.
    *
    * Scale shape: entirely ROW-LOCAL — lane counts, the squared-sum
    * norm, and the divide all live in one scan-side projection, zero
    * shuffles at any corpus size. Integer math until the final divide
    * (counts and their squares are exact), so the only float ops are
    * one sqrt and one divide per lane, 6-dp rounded; the zero-token
    * document keeps an all-zero vector via the norm guard. */
  def hashedDocVectors(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 8): DataFrame = {
    // lane counting is the codegen'd hash_lane_counts kernel — one pass,
    // one md5 per token. The HOF spelling (transform + per-lane filter
    // over md5Prefix32) ran the hash chain in interpreted lambdas and
    // was re-cloned wholesale by expression-copying rules
    // (InferFiltersFromGenerate measured it at 35 s vs 1.2 s at sf0.1);
    // the remaining HOFs below fold a `dims`-element array — constant
    // work per row.
    val hashed = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.hashLaneCounts(col(textCol), dims).as("c"))
    hashed
      .select(col("doc_id"), transform(col("c"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0),
        (a, x) => a + x * x)))
      .select(col("doc_id"),
        transform(col("v"), x => when(col("nrm") === 0, lit(0.0))
          .otherwise(round(x / col("nrm"), 6))).as("embedding"))
  }

  /** CORRECTNESS instantiation: 8-lane hashed vectors, one scalar row
    * per (doc, lane) so the entry stays hash-comparable (the
    * sim_int8_quant discipline). posexplode_OUTER deliberately: the
    * array is always exactly `dims` long (never empty, so outer ≡
    * inner here), and the non-outer form triggers
    * InferFiltersFromGenerate, which clones the ENTIRE nested HOF
    * expression into an interpreted `size(…) > 0` Filter below the
    * Generate — measured 35 s vs 3 s at sf0.1. */
  def hashedVectorDocs(spark: SparkSession, dir: String): DataFrame =
    hashedDocVectors(Tables.load(spark, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), posexplode_outer(col("embedding")).as(Seq("lane", "val")))
      .select(col("doc_id"), col("lane").cast("long").as("lane"), col("val"))

  /** Deterministic MLM sample construction (BERT-style masking) — the
    * sample-building step between a cleaned corpus and a training run:
    * each position masks independently at `pct`% by the engine's
    * hash-draw device (md5Prefix32(doc:pos) % 100 < pct — the
    * stratifiedSample rule, reproducible across runs, engines, and
    * partitionings, and STABLE under corpus edits: a doc's mask depends
    * only on its own id), emitting the masked input text, the
    * `pos:token` recovery targets, and the mask count. Entirely
    * ROW-LOCAL — one scan-side projection, zero shuffles; the
    * re-generation-over-epochs story is the `seed` argument (a new seed
    * re-draws every mask). */
  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
      pct: Int = 15, seed: String = "mlm0"): DataFrame = {
    def sel(i: Column) = GraftFunctions.md5Prefix32(
      concat(lit(seed), lit(":"), col("doc_id").cast("string"),
        lit(":"), i.cast("string"))) % 100 < pct
    val tagged = transform(col("w"),
      (t, i) => when(sel(i), concat(i.cast("string"), lit(":"), t)))
    // coalesce: a NULL text row (the q3 QC class) normalizes to the
    // same empty sample as a zero-token doc on both engines
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"),
        coalesce(array_join(transform(col("w"),
          (t, i) => when(sel(i), lit("<mask>")).otherwise(t)), " "), lit(""))
          .as("input_text"),
        coalesce(array_join(filter(tagged, x => x.isNotNull), " "), lit(""))
          .as("targets"),
        coalesce(size(filter(tagged, x => x.isNotNull)).cast("long"), lit(0L))
          .as("n_masked"))
  }

  /** CORRECTNESS instantiation: 15% masking under the epoch-0 seed. */
  def mlmMaskDocs(spark: SparkSession, dir: String): DataFrame =
    mlmMask(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** Deterministic T5-style SPAN corruption — the sequence-to-sequence
    * sibling of [[mlmMask]] (the published span-denoising objective):
    * the same per-position md5 draw, but maximal RUNS of masked
    * positions collapse into one numbered sentinel each — the input
    * keeps unmasked tokens with `<extra_K>` at each span start, the
    * target lists each sentinel followed by the tokens it hides.
    *
    * Entirely ROW-LOCAL in three STAGED projections (draw bits → span
    * starts + start-position list → assembly) so the md5 draw is
    * written once and never re-inlined into the downstream ops
    * (the InferFiltersFromGenerate lesson); sentinel ordinals come
    * from `array_position` over the start list (O(spans) per lookup)
    * and run lengths from the first unmasked position after each
    * start — no quadratic boolean scans. NULL text normalizes to the
    * empty sample. */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      pct: Int = 15, seed: String = "t5-0"): DataFrame = {
    val drawn = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .select(col("doc_id"), col("w"),
        transform(col("w"), (_, i) => GraftFunctions.md5Prefix32(
          concat(lit(seed), lit(":"), col("doc_id").cast("string"),
            lit(":"), i.cast("string"))) % 100 < pct).as("m"))
    val staged = drawn.select(col("doc_id"), col("w"), col("m"),
      filter(transform(col("m"), (x, i) => when(x &&
          (i === 0 || !get(col("m"), i - 1)), i)), v => v.isNotNull)
        .as("sp"))
    val n = size(col("w"))
    def runLen(i: Column) = {
      val rest = slice(col("m"), i + 2, n)
      val p = array_position(rest, lit(false))
      lit(1) + when(p === 0, size(rest)).otherwise(p - 1)
    }
    val sentinel = (i: Column) =>
      concat(lit("<extra_"), (array_position(col("sp"), i) - 1).cast("string"), lit(">"))
    staged.select(col("doc_id"),
      coalesce(array_join(filter(transform(col("w"), (t, i) =>
          when(!element_at(col("m"), i + 1), t)
            .when(array_position(col("sp"), i) > 0, sentinel(i))),
        v => v.isNotNull), " "), lit("")).as("input_text"),
      coalesce(array_join(flatten(filter(transform(col("sp"),
          i => concat(array(sentinel(i)), slice(col("w"), i + 1, runLen(i)))),
        v => v.isNotNull)), " "), lit("")).as("target_text"),
      coalesce(size(col("sp")).cast("long"), lit(0L)).as("n_spans"),
      coalesce(size(filter(col("m"), x => x)).cast("long"), lit(0L))
        .as("n_masked"))
  }

  /** CORRECTNESS instantiation: 15% draw under the epoch-0 seed. */
  def spanCorruptDocs(spark: SparkSession, dir: String): DataFrame =
    spanCorrupt(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** SEMANTIC search over raw text — the query is a STRING, the corpus
    * is the documents table, and no trained model exists anywhere: the
    * query embeds driver-side through the SAME `hash_lane_counts`
    * kernel the corpus uses (a dims-length literal — the probe-set
    * legitimacy class), and [[Similarity.topKCosine]]'s
    * broadcast-probe + pre-exchange `topk_by` k-cut runs unchanged.
    * Completes the retrieval family: lexical ([[bm25Rank]]), phrase
    * ([[phraseCount]]), hybrid ([[hybridSearch]]) — and now
    * model-free dense. Zero-token docs keep zero vectors whose NaN
    * cosine the topk aggregate skips (the sim_topk_cosine contract).
    * query_id is −1: a text probe is not a corpus row, so no corpus
    * doc is self-excluded. */
  def semanticSearch(spark: SparkSession, dir: String, queryText: String,
      k: Int = 10, dims: Int = 8): DataFrame = {
    val corpus = hashedDocVectors(
        Tables.load(spark, dir, "documents"), "doc_id", "text", dims)
      .select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val counts = graft.functions.TextKernels
      .hashLaneCounts(org.apache.spark.unsafe.types.UTF8String
        .fromString(queryText), dims).toLongArray()
    val nrm = math.sqrt(counts.map(c => c.toDouble * c.toDouble).sum)
    val qv = counts.map(c => if (nrm == 0) 0.0f
      else BigDecimal(c.toDouble / nrm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toFloat)
    val queries = spark.range(1).select(lit(-1L).as("query_id"),
      array(qv.toIndexedSeq.map(lit): _*).cast("array<float>").as("q_emb"))
    Similarity.topKCosine(corpus, queries, k)
  }

  /** CORRECTNESS instantiation: a fixed in-vocabulary probe phrase,
    * top 10. */
  def semanticSearchDocs(spark: SparkSession, dir: String): DataFrame =
    semanticSearch(spark, dir, "table scan query fast value sort")

  /** WITHIN-document repeated-window strip — the intra-document sibling
    * of [[boilerplateStrip]] (the other half of the published
    * line-dedup recipe: a page repeating its own nav block, a generation
    * loop repeating its own sentence): within each doc, keep the FIRST
    * occurrence of every distinct `window`-token slice and drop later
    * repeats. Where [[repetitionStats]] SCORES within-doc duplication,
    * this op REMOVES it.
    *
    * Scale shape: entirely ROW-LOCAL — every slice of a document lives
    * in the document's own row, so first-occurrence dedup is one
    * scan-side projection (index-aware `filter` against
    * `array_position`'s first-match semantics), ZERO shuffles at any
    * corpus size. Quadratic only in slices-per-document (the
    * repetitionStats trade, explicitly fine at document lengths).
    * NULL text coalesces to empty BEFORE tokenizing (the E135/E136 NULL
    * discipline, mirrored in the oracle — without it the `n > 0` branch
    * would yield ('', 0, NULL) on Spark while the oracle propagates
    * NULL). Output: (doc_id, clean_text, n_kept, n_dropped). */
  def dedupWithinDoc(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 2): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("n_segs",
        ceil(col("n").cast("double") / window).cast("long"))
      .withColumn("ss", when(col("n") > 0,
          transform(sequence(lit(0L), col("n_segs") - 1),
            i => array_join(slice(col("toks"),
              (i * window + 1).cast("int"), lit(window)), " ")))
        .otherwise(array().cast("array<string>")))
    base.select(col("doc_id"),
        array_join(filter(col("ss"),
          (s, i) => array_position(col("ss"), s) === i + 1), " ")
          .as("clean_text"),
        size(filter(col("ss"),
          (s, i) => array_position(col("ss"), s) === i + 1))
          .cast("long").as("n_kept"),
        col("n_segs"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (col("n_segs") - col("n_kept")).as("n_dropped"))
  }

  /** CORRECTNESS instantiation: 2-token slices (the synthetic word-salad
    * repeats 2-grams within docs naturally — 181/500 docs cut at
    * sf0.01; real pipelines use line/paragraph units). */
  def dedupWithinDocs(spark: SparkSession, dir: String): DataFrame =
    dedupWithinDoc(Tables.load(spark, dir, "documents"), "doc_id", "text")

  /** TRAINED quality classifier — logistic regression by distributed
    * batch gradient descent, the published web-corpus recipe (GPT-3 /
    * CCNet class: fit a linear model to separate a CURATED slice from
    * the rest, score every document, filter on the probability): weak
    * labels come from source membership, features are the scan-side
    * quality signals (stopword ratio, mean token length), and training
    * is full-batch GD — per round, ONE two-phase aggregate over the
    * persisted feature projection computes the three gradient sums (one
    * row over the shuffle), the 3-double weight read-back is the bounded
    * trainer-collect class (the BPE argmax / k-means centroid
    * precedent), and the next round's plan takes the weights as
    * literals. Scoring is one scan-side projection with the final
    * weights.
    *
    * Cross-engine float discipline (the kmeans device): features are
    * 6-dp rounded at construction, weights are 6-dp rounded per round —
    * absorbing both the partial-vs-sequential summation-order drift and
    * any last-ulp libm exp() divergence — and every association
    * (z = (b + w1·x1) + w2·x2, grad = (η·Σ)/n, update = w − grad) is
    * mirrored exactly in the oracle SQL. Zero-token docs carry no
    * features and are dropped up front. */
  def trainQualityLr(docs: DataFrame, curated: Seq[String],
      iters: Int = 3, eta: Double = 1.0): DataFrame = {
    val toks = tokens(col("text"))
    val feats = docs
      .select(col("doc_id"), col("source"),
        size(toks).as("nt"),
        size(filter(toks, t => t.isInCollection(qcStopwords))).as("ns"),
        aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("tc"))
      .filter(col("nt") > 0)
      .select(col("doc_id"), col("source"),
        when(col("source").isInCollection(curated), lit(1.0))
          .otherwise(lit(0.0)).as("y"),
        round(col("ns").cast("double") / col("nt"), 6).as("x1"),
        round(col("tc").cast("double") / col("nt"), 6).as("x2"))
      .localCheckpoint()
    var w = (0.0, 0.0, 0.0)
    for (_ <- 1 to iters) {
      val z = lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val row = feats.agg(
        round(lit(w._1) - lit(eta) * sum(p - col("y")) / count(lit(1)), 6).as("b"),
        round(lit(w._2) - lit(eta) * sum((p - col("y")) * col("x1")) / count(lit(1)), 6).as("w1"),
        round(lit(w._3) - lit(eta) * sum((p - col("y")) * col("x2")) / count(lit(1)), 6).as("w2"))
        .collect()(0)
      w = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    }
    val z = lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")
    feats.select(col("doc_id"), col("source"),
      col("y").cast("long").as("y"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"))
  }

  /** CORRECTNESS instantiation: src0–src2 as the curated slice, 3 GD
    * rounds. */
  def qualityLrDocs(spark: SparkSession, dir: String): DataFrame =
    trainQualityLr(Tables.load(spark, dir, "documents"),
      Seq("src0", "src1", "src2"))

  /** CALIBRATION curve for the trained classifier — the reliability
    * diagram every model-based filter should ship with (public ML-eval
    * practice: bin the predicted probabilities, compare each bin's mean
    * prediction to its observed positive rate; a well-calibrated
    * filter's threshold means what it says, a mis-calibrated one
    * silently shifts the effective cut): equal-width probability bins,
    * top edge clamped in. One two-phase aggregate over the scored
    * projection — ≤ `bins` rows cross the shuffle. */
  def lrCalibration(spark: SparkSession, dir: String,
      bins: Int = 10): DataFrame =
    qualityLrDocs(spark, dir)
      .select(
        least(floor(col("score") * bins), lit((bins - 1).toLong))
          .cast("long").as("bin"),
        col("score"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(avg(col("score")), 6).as("mean_pred"),
        round(avg(col("y").cast("double")), 6).as("obs_rate"))

  /** DSIR-class importance-weighted data selection (Xie et al., NeurIPS
    * 2023, "Data Selection for Language Models via Importance Resampling"
    * — public): pick the raw-corpus documents whose hashed-token profile
    * best matches a TARGET domain, the published device for "make the
    * pretraining mix look like the domain you care about" without a
    * trained model anywhere.
    *
    * Features are the [[hashedDocVectors]] lane counts (the codegen
    * `hash_lane_counts` kernel — one pass, one md5 per token); both bag
    * models are add-one-smoothed lane distributions, so the per-document
    * importance weight is log p̂_target(doc) − log p̂_raw(doc)
    * = Σ_lane cnt·(ln p̂_t[lane] − ln p̂_r[lane]).
    *
    * Scale shape: the model fit is one row-local posexplode + a two-phase
    * aggregate moving ≤ dims rows per partition; the per-lane
    * log-likelihood ratios are a DIMS-row bounded collect (the
    * centroid/codebook probe-set class) entering scoring as a plan
    * literal, so scoring is entirely ROW-LOCAL — a sequential
    * `aggregate` fold over the doc's own lane counts, zero joins, zero
    * shuffles beyond the model fit — and the k-cut is a per-task-heap
    * `TakeOrderedAndProject`. Determinism: llr is 6-dp rounded BEFORE
    * the fold (absorbing the 1-ulp cross-engine `ln` class), the fold is
    * left-to-right on both engines, and the final weight rounds to 6 dp
    * (the bigram-LM discipline).
    *
    * The selection is the paper's top-k deterministic variant (their
    * Gumbel-top-k reduces to this as temperature → 0); target documents
    * never score — they define the distribution, not the candidate
    * pool. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dims: Int = 64, k: Int = 100): DataFrame = {
    val base = dsirBase(docs, idCol, textCol, isTarget, dims)
    dsirScore(base, collectLlr(dsirLlr(base, dims)), k)
  }

  private def dsirBase(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dims: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), isTarget.as("is_target"),
      GraftFunctions.hashLaneCounts(col(textCol), dims).as("cnt"))

  /** The fitted model as a relation: one (lane, llr) row per lane —
    * what [[landDsirModel]] persists. */
  private def dsirLlr(base: DataFrame, dims: Int): DataFrame = {
    val model = base
      .select(col("is_target"), posexplode(col("cnt")).as(Seq("lane", "c")))
      .groupBy("lane")
      .agg(sum(when(col("is_target"), col("c")).otherwise(0L)).as("tc"),
        sum(when(!col("is_target"), col("c")).otherwise(0L)).as("rc"))
    model
      .crossJoin(broadcast(model.agg(sum("tc").as("tt"), sum("rc").as("rt"))))
      .select(col("lane"),
        round(log((col("tc") + lit(1.0)) / (col("tt") + lit(dims.toDouble))) -
          log((col("rc") + lit(1.0)) / (col("rt") + lit(dims.toDouble))), 6)
          .as("llr"))
  }

  /** Bounded collect of the (lane, llr) relation in lane order — dims
    * rows, the centroid/codebook probe-set class. */
  private def collectLlr(llr: DataFrame): Array[Double] =
    llr.orderBy("lane").collect().map(_.getDouble(1))

  /** The row-local importance-weight projection shared by the
    * deterministic and Gumbel selections. */
  private def dsirWeights(base: DataFrame, llr: Array[Double]): DataFrame = {
    val llrLit = array(llr.map(lit(_)).toIndexedSeq: _*)
    base.filter(!col("is_target"))
      .select(col("doc_id"),
        round(aggregate(zip_with(col("cnt"), llrLit,
          (c, l) => c.cast("double") * l), lit(0.0), _ + _), 6).as("weight"))
  }

  private def dsirScore(base: DataFrame, llr: Array[Double],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = dsirWeights(base, llr)
    val w = Window.orderBy(col("weight").desc, col("doc_id").asc)
    scored.orderBy(col("weight").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
  }

  /** The paper's actual RESAMPLE step — Gumbel-top-k over the importance
    * weights (sampling k documents ∝ exp(weight/T) without replacement,
    * the standard Gumbel-max device): key = weight/T − ln(−ln(u)), top k
    * by key. The noise u is the engine's DETERMINISTIC md5 draw (the
    * [[temperatureMix]] / stratifiedSample convention — reproducible
    * across runs, engines, and partitionings; a new epoch is a salt on
    * the id, exactly [[mlmMask]]'s seed rule), so "sampling" here is a
    * pure function of (corpus, model, T) — the property a data pipeline
    * wants from its selection step. T → 0 recovers [[dsirSelect]]'s
    * deterministic top-k; larger T trades match quality for diversity
    * (the paper's motivation for resampling over ranking). Still
    * entirely ROW-LOCAL after the model fit: one projection, the same
    * top-k heap cut. */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dims: Int = 64, k: Int = 100,
      temp: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = dsirBase(docs, idCol, textCol, isTarget, dims)
    val keyed = dsirWeights(base, collectLlr(dsirLlr(base, dims)))
      .withColumn("u", GraftFunctions.md5Uniform(col("doc_id").cast("string")))
      .withColumn("key",
        round(col("weight") / temp - log(-log(col("u"))), 6))
      .drop("u")
    val w = Window.orderBy(col("key").desc, col("doc_id").asc)
    keyed.orderBy(col("key").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
  }

  /** CORRECTNESS instantiation: T = 2 resample of the [[dsirDocs]]
    * selection problem. */
  def dsirResampleDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    dsirResample(docs, "doc_id", "text", col("lang") === "en")
  }

  /** Land the fitted DSIR model — the dims-row (lane, llr) table — as a
    * catalog artifact, so steady serves (and streamed admission gates)
    * score under a FROZEN model with no fit anywhere in the plan: the
    * production asymmetry of every landed-quantizer path (arrivals never
    * influence the model they are scored under). */
  def landDsirModel(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, dims: Int, prefix: String, path: String): Unit =
    dsirLlr(dsirBase(docs, idCol, textCol, isTarget, dims), dims)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/llr").saveAsTable(s"${prefix}_llr")

  /** Catalog table-name prefix for a corpus dir's landed DSIR model. */
  def dsirPrefix(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"dsir_steady_$suffix"
  }

  private def ensureDsirModel(spark: SparkSession, dir: String): Unit =
    graft.sources.Landing.ensureLanded(spark, dsirPrefix(dir),
      Seq(s"${dsirPrefix(dir)}_llr")) { path =>
      landDsirModel(Tables.load(spark, dir, "documents"),
        "doc_id", "text", col("lang") === "en", 64, dsirPrefix(dir), path)
    }

  /** STEADY-STATE [[dsirDocs]]: score + cut under the LANDED model —
    * the per-batch production plan (one scan-side kernel projection, a
    * dims-row artifact read, the top-k heap); no posexplode, no model
    * aggregate, no fit. Same answer, same oracle. */
  def dsirDocsSteady(spark: SparkSession, dir: String): DataFrame = {
    ensureDsirModel(spark, dir)
    val llr = collectLlr(spark.table(s"${dsirPrefix(dir)}_llr"))
    dsirScore(dsirBase(Tables.load(spark, dir, "documents"),
      "doc_id", "text", col("lang") === "en", 64), llr, k = 100)
  }

  /** CORRECTNESS instantiation: English documents are the target domain,
    * every other language is the raw pool; top 100 (binds at sf ≥ 0.01 —
    * 282 raw docs at sf0.01). */
  def dsirDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    dsirSelect(docs, "doc_id", "text", col("lang") === "en")
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

  // --------------------------------------------------------------------
  // Corpus curation report — the per-source operational dashboard a
  // curation team reads daily: volume, token share, exact-dup rate,
  // quality keep rate, and gram-novelty share, one row per source.
  // --------------------------------------------------------------------

  /** The planted report corpus: documents ∪ verbatim copies of every 7th
    * doc (shifted ids, SAME source/lang — the [[Dedup.plantedExactDocs]]
    * id scheme carrying the full column set), so per-source dup and
    * novelty rates are non-trivial; without planting the synthetic
    * corpus's dup columns would be vacuously zero (round-2 feedback). */
  def curationCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text")
    docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        col("lang"), col("source"), col("text")))
  }

  /** Per-source curation report over any (doc_id, lang, source, text)
    * corpus: document/duplicate counts, exact-dup rate (content
    * fingerprint already held by an earlier doc — the novelty asymmetry,
    * so the FIRST copy is not the dup), token volume and corpus share,
    * the [[qualityKeep]] pass rate, and the gram-novelty share
    * (micro-averaged [[Dedup.noveltyScores]]: Σ novel / Σ grams — the
    * exact-integer form; a mean of per-doc ratios would be order-fragile
    * cross-engine).
    *
    * Scale shape: ONE text-projection pass for stats+fingerprint, the
    * novelty pipeline's two gram aggregates, then |sources|-row
    * aggregation; the corpus token total is a 1-row broadcast (the
    * adjudicated constant-side class). Every reported rate divides exact
    * integers — 6-dp rounding is display only. */
  def curationReport(docs: DataFrame): DataFrame =
    curationReportTail(curationBySource(docs))

  /** The |sources|-row ADDITIVE aggregate under the report — the half a
    * maintained serve lands/folds: (source, n_docs, n_dups, tokens_sum,
    * n_keep, g_sum, nov_sum). Every column is a sum/count, so per-batch
    * contributions add (dup/novelty contributions add under the arrival
    * contract — landed ids precede batch ids — via
    * [[curationBatchRows]]'s incremental rules). `lang` is optional —
    * the report never reads it. */
  def curationBySource(docs0: DataFrame): DataFrame = {
    val docs = if (docs0.columns.contains("lang")) docs0
      else docs0.withColumn("lang", lit("und"))
    val withFp = docs.withColumn("fp", md5(col("text").cast("binary")))
    // pinned: the stats projection feeds BOTH the fingerprint-first
    // aggregate and the per-doc join — unpinned, the text scan and the
    // quality kernels would run twice (the contamFraction lesson). The
    // pinned relation is text-free (ints + a 32-char fp per doc).
    val stats = qualityStatsOf(
      withFp.select("doc_id", "lang", "source", "fp", "text"))
      .withColumn("keep", qualityKeep)
      .localCheckpoint()
    val firstFp = stats.groupBy("fp").agg(min("doc_id").as("first_id"))
    val nov = Dedup.noveltyScores(docs, "doc_id", "text")
      .select("doc_id", "n_grams", "n_novel")
    val perDoc = stats.join(firstFp, "fp").join(nov, "doc_id")
    perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("first_id") < col("doc_id"), 1L).otherwise(0L)).as("n_dups"),
      sum(col("n_tokens").cast("long")).as("tokens_sum"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      sum(col("n_grams")).as("g_sum"),
      sum(col("n_novel")).as("nov_sum"))
  }

  /** The rate tail over any [[curationBySource]]-shaped relation —
    * |sources| rows in, the report out. Pinned (the rows feed the 1-row
    * corpus total AND the final select), exact-integer divisions, 6-dp
    * display rounding. Shared by the direct report, the landed steady
    * serve, and the unified loop's maintained serve. */
  def curationReportTail(bySource0: DataFrame): DataFrame = {
    val bySource = bySource0.localCheckpoint()
    val total = bySource.agg(sum("tokens_sum").as("tokens_total"))
    bySource.crossJoin(broadcast(total)).select(
      col("source"), col("n_docs"), col("n_dups"),
      round(col("n_dups").cast("double") / col("n_docs"), 6).as("dup_rate"),
      col("tokens_sum"),
      round(col("tokens_sum").cast("double") / col("tokens_total"), 6)
        .as("token_share"),
      round(col("n_keep").cast("double") / col("n_docs"), 6).as("keep_rate"),
      round(col("nov_sum").cast("double") / col("g_sum"), 6)
        .as("novel_gram_share"))
  }

  /** One batch's ADDITIVE per-source contribution against accumulated
    * state — the incremental form of [[curationBySource]] the unified
    * loop lands per micro-batch: a doc is a DUP if its content
    * fingerprint is already in `seenFps` (landed corpus) or held by an
    * earlier (smaller-id) doc of the same batch; a gram is NOVEL iff
    * absent from `seenGrams` (the maintained df relation) and the doc is
    * its first in-batch holder (the [[graft.streaming.StreamSoftDf
    * .noveltyArrivals]] rule). Under the arrival contract (landed ids
    * precede batch ids), summing these contributions over batches equals
    * [[curationBySource]] on the union — the serve ≡ batch law.
    *
    * Scale shape per batch: the quality/gram kernels are batch-local
    * scan-side; the two probes join the BATCH side against the
    * accumulated fp / gram-presence relations — the same per-batch cost
    * class as the exact gate's fp anti-join and the soft-df weight
    * serve. Text never shuffles. */
  def curationBatchRows(batch: DataFrame, seenFps: DataFrame,
      seenGrams: DataFrame, n: Int = 3): DataFrame = {
    val stats = qualityStatsOf(batch
      .withColumn("lang", lit("und"))
      .withColumn("fp", md5(col("text").cast("binary")))
      .select("doc_id", "lang", "source", "fp", "text"))
      .withColumn("keep", qualityKeep)
      .localCheckpoint()
    val batchFirstFp = stats.groupBy("fp").agg(min("doc_id").as("first_id"))
    val seenFp = seenFps.select(col("fp")).distinct().withColumn("fseen", lit(1))
    val withDup = stats.join(batchFirstFp, "fp")
      .join(seenFp, Seq("fp"), "left_outer")
      .select(col("doc_id"), col("source"), col("n_tokens"), col("keep"),
        (col("fseen").isNotNull || col("first_id") < col("doc_id")).as("is_dup"))
    val ex = batch.select(col("doc_id"),
      explode(array_distinct(Dedup.shingleHashes(col("text"), n))).as("gh"))
    val bfirst = ex.groupBy("gh").agg(min("doc_id").as("bfirst"))
    val seenGh = seenGrams.select(col("gh")).withColumn("gseen", lit(1))
    val nov = ex.join(bfirst, "gh")
      .join(seenGh, Seq("gh"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gseen").isNull && col("bfirst") === col("doc_id"), 1L)
          .otherwise(0L)).as("n_novel"))
    withDup.join(nov, Seq("doc_id"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dups"),
        sum(col("n_tokens").cast("long")).as("tokens_sum"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        sum(col("n_grams")).as("g_sum"),
        sum(col("n_novel")).as("nov_sum"))
  }

  /** Catalog prefix for the landed per-source curation stats of a corpus
    * dir (the MD5 collision rationale shared with
    * [[graft.operators.Dedup.softDfPrefix]]). */
  def curationPrefix(dir: String): String = {
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    s"curation_steady_$suffix"
  }

  /** Land the |sources|-row additive aggregate as a catalog table — the
    * corpus scan paid ONCE per (immutable) corpus dir. */
  def landCurationStats(corpus: DataFrame, prefix: String,
      path: String): Unit =
    curationBySource(corpus)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/src_stats").saveAsTable(s"${prefix}_src_stats")

  /** CORRECTNESS instantiation over the planted report corpus. */
  def curationReportDocs(spark: SparkSession, dir: String): DataFrame =
    curationReport(curationCorpus(spark, dir))

  /** STEADY-STATE [[curationReportDocs]] — the report served off the
    * MAINTAINED additive per-source aggregates instead of a per-request
    * corpus rescan (the round-11 observation: the direct report is one
    * text-projection pass, linear in the corpus — 3.2 s at sf1, a
    * non-answer for a daily dashboard at 100 TB): the |sources|-row
    * stats land once per corpus dir, every serve is the
    * [[curationReportTail]] fold over |sources| rows — metadata-scale,
    * corpus-size-independent. Same answer, same oracle as the direct
    * entry (landed ≡ direct law); the streaming maintenance of the same
    * relation lives in [[graft.streaming.UnifiedIngest]]'s curation
    * generations. */
  def curationReportSteadyDocs(spark: SparkSession, dir: String): DataFrame = {
    val prefix = curationPrefix(dir)
    graft.sources.Landing.ensureLanded(spark, prefix,
      Seq(s"${prefix}_src_stats")) { path =>
      landCurationStats(curationCorpus(spark, dir), prefix, path)
    }
    curationReportTail(spark.table(s"${prefix}_src_stats"))
  }

  // --------------------------------------------------------------------
  // Retrieval evaluation — recall@k / MRR / nDCG@k for the lexical serve
  // (the retrieval-family sibling of the annRecall harness: the ANN side
  // has its recall dial monitored; the BM25 side gets the classic IR
  // eval row).
  // --------------------------------------------------------------------

  /** Evaluate [[bm25Rank]]'s top-`k` for `query` against the
    * deterministic binary qrel "document contains EVERY query term"
    * (SQL-expressible ground truth — no human labels in this corpus).
    * One output row: n_rel, rel_at_k, recall@k, MRR (1/rank of the first
    * relevant), nDCG@k with binary gains.
    *
    * Determinism: ranks come from the SERVED ranking's rounded scores
    * (ties broken by doc_id — the same order the oracle's window uses);
    * recall divides exact integers; DCG and ideal-DCG are ≤ k-term sums
    * of 1/log2(rank+1) — the ideal side a left-to-right fold over
    * 1..min(n_rel, k) on both engines, and the 6-dp round absorbs
    * summation-order ulp on the DCG side (the BM25 score-sum argument). */
  def retrievalEval(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String], k: Int = 25): DataFrame =
    retrievalEvalOf(bm25Rank(docs, idCol, textCol, query, k),
      relevantIds(docs, idCol, textCol, query), idCol, k)

  /** The deterministic binary qrel: ids of documents containing EVERY
    * query term. */
  def relevantIds(docs: DataFrame, idCol: String, textCol: String,
      query: Seq[String]): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("w"))
      .filter(query.map(t => array_contains(col("w"), t)).reduce(_ && _))
      .select("doc_id")

  /** The eval tail over ANY (idCol, score) ranking — shared by the
    * direct and the landed-index serve (same answer by the landed ≡
    * direct law, hence the shared oracle). */
  def retrievalEvalOf(ranking: DataFrame, rel: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val ranked = ranking
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol))))
    // pinned: the qrel feeds the hit join AND the n_rel count —
    // unpinned, its corpus token scan runs twice. Ids only, n_rel rows.
    val relPinned = rel.localCheckpoint()
    val hits = ranked.join(relPinned, ranked(idCol) === relPinned("doc_id"))
    val agg = hits.agg(
      count(lit(1)).as("rel_at_k"),
      min(col("rnk")).as("first_rank"),
      coalesce(sum(lit(1.0) / log2(col("rnk").cast("double") + 1)), lit(0.0))
        .as("dcg"))
    val relCount = relPinned.agg(count(lit(1)).as("n_rel"))
    val idcg = aggregate(
      sequence(lit(1), least(col("n_rel"), lit(k.toLong)).cast("int")),
      lit(0.0), (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
    agg.crossJoin(broadcast(relCount)).select(
      lit(k).as("k"), col("n_rel"), col("rel_at_k"),
      round(col("rel_at_k").cast("double") / col("n_rel"), 6).as("recall_at_k"),
      round(when(col("first_rank").isNull, 0.0)
        .otherwise(lit(1.0) / col("first_rank")), 6).as("mrr"),
      round(when(col("rel_at_k") === 0L, 0.0)
        .otherwise(col("dcg") / idcg), 6).as("ndcg"))
  }

  /** CORRECTNESS instantiation: the [[searchQuery]] eval row at k=25. */
  def retrievalEvalDocs(spark: SparkSession, dir: String): DataFrame =
    retrievalEval(Tables.load(spark, dir, "documents"), "doc_id", "text",
      searchQuery)

  /** The eval row computed against the LANDED bucket-pruned serve
    * ([[bm25RankIndexed]]) instead of the direct ranking — same answer
    * by the landed ≡ direct law (shared oracle); what it certifies is
    * that the eval harness runs off the production index with no corpus
    * rescore. (The qrel projection still scans the corpus — it is the
    * ground-truth side of the eval, not the serve.) */
  def retrievalEvalSteadyDocs(spark: SparkSession, dir: String): DataFrame = {
    ensureSearchIndex(spark, dir)
    retrievalEvalOf(
      bm25RankIndexed(spark, searchIndexPrefix(dir), searchQuery, k = 25),
      relevantIds(Tables.load(spark, dir, "documents"), "doc_id", "text",
        searchQuery),
      "doc_id", k = 25)
  }
}
