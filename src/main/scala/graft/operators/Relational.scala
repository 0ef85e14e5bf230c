package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Relational coverage the reference's Athena surface never exercises but
  * any user of a SQL-on-files layer reaches for immediately: set
  * operations, ROLLUP subtotals, pivot, and deterministic sampling
  * (SURVEY §2.4 lists set ops / grouping sets as explicitly absent from
  * the reference).
  *
  * Scale notes: every operator here is a shuffle on a small key (user-day,
  * day×type, user_id) with two-phase aggregation; the sampler is a pure
  * scan-side projection whose selectivity reaches the Parquet scan as an
  * ordinary filter.
  */
object Relational {

  /** INTERSECT / EXCEPT over (user, day) activity sets: which user-days
    * clicked AND purchased, clicked only, purchased only — tagged union of
    * the three (both EXCEPT directions stay non-vacuous on data where
    * every user eventually does everything; day granularity is what makes
    * the differences non-empty).
    *
    * Implementation is the one-scan form: a literal
    * `a INTERSECT b UNION ALL a EXCEPT b …` plan re-evaluates each
    * distinct leg per set expression — six scans and six distinct
    * shuffles of the fact table. Deriving per-(user, day) membership
    * flags in ONE two-phase aggregate and tagging with a CASE computes
    * the identical three-way partition with one scan and one shuffle —
    * the set-op semantics, at the aggregation price. */
  def setOps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        max(col("event_type") === "click").as("c"),
        max(col("event_type") === "purchase").as("p"))
      .select(
        when(col("c") && col("p"), "both")
          .when(col("c"), "click_only")
          .otherwise("purchase_only").as("op"),
        col("user_id"), col("day"))

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL) over the
    * (user, day) click vs view multisets, reported as per-key
    * multiplicities. Same one-scan shape as [[setOps]]: both legs' counts
    * come out of ONE two-phase aggregate, then
    * `intersect_all = least(ca, cb)` and `except_all = ca − cb` (when
    * positive) — which is exactly how an engine executes the ALL variants
    * (the DuckDB oracle runs the literal INTERSECT ALL / EXCEPT ALL and
    * re-groups, checking the equivalence). */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("ca"),
        count(when(col("event_type") === "view", 1)).as("cb"))
    counts.filter(least(col("ca"), col("cb")) > 0)
      .select(lit("intersect_all").as("op"), col("user_id"), col("day"),
        least(col("ca"), col("cb")).as("n"))
      .unionAll(counts.filter(col("ca") > col("cb"))
        .select(lit("except_all").as("op"), col("user_id"), col("day"),
          (col("ca") - col("cb")).as("n")))
  }

  /** Schema-evolution union: append-era files that predate a column union
    * cleanly with files that carry it — `unionByName` with
    * `allowMissingColumns` NULL-fills the missing side, positionally-safe
    * (a positional UNION would silently mis-bind columns). Instantiated
    * as legacy (even event_id, no `props`) ∪ evolved (odd event_id, with
    * `props`); scan-side projections, no shuffle. */
  def unionEvolved(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val legacy = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("value"))
    val evolved = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("props"), col("user_id"), col("value"))
    legacy.unionByName(evolved, allowMissingColumns = true)
  }

  /** Day × event-type ROLLUP: leaf rows plus per-day subtotals plus the
    * grand total, with grouping markers so consumers can tell a real NULL
    * from a subtotal row. One pass, one shuffle — Spark expands rollup
    * grouping sets inside a single two-phase aggregate rather than
    * re-scanning per level. Sum rounded to 6 dp (double merge order
    * differs across engines by design). */
  def dailyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("day", date_trunc("day", col("ts")))
      .rollup("day", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        grouping(col("day")).cast("long").as("g_day"),
        grouping(col("event_type")).cast("long").as("g_type"))

  /** Day × event-type CUBE — the full grouping-sets lattice ([[dailyRollup]]
    * plus the per-type-across-all-days subtotals a rollup omits). Same
    * single Expand + two-phase aggregate machinery; the lattice is 4
    * grouping sets instead of 3, still one scan. */
  def dailyCube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("day", date_trunc("day", col("ts")))
      .cube("day", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"),
        grouping(col("day")).cast("long").as("g_day"),
        grouping(col("event_type")).cast("long").as("g_type"))

  private[operators] val eventTypes =
    Seq("click", "error", "purchase", "signup", "view")

  /** Per-user activity matrix: event counts pivoted to one column per
    * event type. The pivot values are declared (not inferred) so the
    * schema is static and the plan is a single two-phase aggregate — an
    * inferred pivot costs an extra distinct-values job. Missing
    * combinations are 0, not NULL (matrix semantics). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0, eventTypes)

  /** Full-outer join of two daily aggregates (high-value clicks vs
    * high-value purchases): the join type the surface was still missing,
    * with COALESCE null-filling on both the key and the measures. The >95
    * value filter thins each side so both unmatched directions actually
    * occur (an unfiltered daily rollup has every day on both sides and the
    * outer join degenerates to inner — vacuously green). Two small
    * aggregates join after shuffling one row per day each. */
  def dailyFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    def daily(t: String, as: String): DataFrame = ev
      .filter(col("event_type") === t && col("value") > 95)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as(as))
    daily("click", "n_click").as("c")
      .join(daily("purchase", "n_purchase").as("p"),
        col("c.day") === col("p.day"), "full_outer")
      .select(
        coalesce(col("c.day"), col("p.day")).as("day"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("n_purchase"), lit(0L)).as("n_purchase"))
  }

  /** The one EXISTS/NOT-EXISTS SQL text, parameterized only by the table
    * names: the Spark entry runs it over scoped temp views, the DuckDB
    * oracle runs it verbatim over `events`/`customer` — a single source of
    * truth, so the two sides cannot drift. */
  def existsSql(events: String, customer: String): String =
    s"""SELECT c_custkey, c_name
       |FROM $customer c
       |WHERE EXISTS (SELECT 1 FROM $events e
       |              WHERE e.user_id = c.c_custkey AND e.event_type = 'error')
       |  AND NOT EXISTS (SELECT 1 FROM $events e2
       |                  WHERE e2.user_id = c.c_custkey
       |                    AND e2.event_type = 'purchase' AND e2.value > 95)""".stripMargin

  /** Correlated EXISTS / NOT EXISTS through the SQL entry point — written
    * the way an analyst writes it, so Catalyst's subquery decorrelation is
    * what's under test: both subqueries rewrite to semi/anti hash joins on
    * user_id (no per-row subquery execution exists in Spark at all — the
    * decorrelated plan IS the operator). Views are registered under scoped
    * names: re-pointing a session-global `events` view at this entry's dir
    * would silently redirect every later spark.sql in the session. */
  def existsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("graft_exists_events")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("graft_exists_customer")
    spark.sql(existsSql("graft_exists_events", "graft_exists_customer"))
  }

  /** Per-stratum sampling rates (percent kept), keyed by event type:
    * keep every error, half of purchases, a tenth of the high-volume
    * types — the standard class-rebalance shape for training data. */
  val defaultRates: Map[String, Int] =
    Map("error" -> 100, "purchase" -> 50, "click" -> 10, "view" -> 10, "signup" -> 10)

  /** Deterministic stratified sample: keep a row iff the first 32 bits of
    * md5(event_id) land under its stratum's rate. Hash-mod sampling
    * instead of `sample()`/rand(): the decision is a pure function of the
    * row, so it is reproducible across runs, engines (the oracle recomputes
    * it in DuckDB), retries, AND across tables — sampling two tables by the
    * same key keeps them referentially consistent. Scan-side projection +
    * filter; no shuffle, no state, trivially parallel at any scale. */
  def stratifiedSample(
      spark: SparkSession, dir: String,
      rates: Map[String, Int] = defaultRates): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val bucket =
      graft.functions.GraftFunctions.md5Prefix32(col("event_id").cast("string")) % 100
    val rate = rates.foldLeft(lit(0)) { case (acc, (t, r)) =>
      when(col("event_type") === t, lit(r)).otherwise(acc)
    }
    ev.filter(bucket < rate)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (the public
    * Efraimidis–Spirakis A-ES scheme): each row draws key = u^(1/w) with
    * u a fixed-point uniform derived from the row id's md5 (same 32-bit
    * prefix trick as [[stratifiedSample]] — reproducible across runs,
    * engines, and partitionings, unlike `rand()`), and the k largest keys
    * per stratum win. Higher weight ⇒ key closer to 1 ⇒ selection
    * probability proportional to weight, the exact A-ES guarantee.
    *
    * Scale shape: the key is a scan-side codegen projection; the per-
    * stratum cut is the native `topk_by` partial-merge aggregate — at
    * most k (score, id) pairs per stratum per partition cross the
    * shuffle, never the corpus (same plan as q_top_per_group, ties
    * broken (key DESC, id ASC) identically to the oracle's ORDER BY). */
  def weightedSample(df: DataFrame, stratum: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val u = graft.functions.GraftFunctions.md5Uniform(col(idCol).cast("string"))
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.select(col(stratum), key.as("key"), col(idCol))
      .groupBy(stratum)
      .agg(graft.functions.GraftFunctions.topKBy(col("key"), col(idCol), k).as("top"))
      .select(col(stratum), explode(col("top")).as("t"))
      .select(col(stratum), col(s"t.id").as(idCol), round(col("t.score"), 6).as("key"))
  }

  /** Quality-weighted document sample: 20 docs per language, selection
    * probability ∝ document length. */
  def weightedDocSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    weightedSample(Tables.load(spark, dir, "documents"), "lang", "doc_id", "n_chars", k)

  /** Deterministic train/val/test assignment: the md5-bucket decision
    * (pure function of the row id — stable under reruns, appends, and
    * repartitioning, so a document NEVER migrates between splits as the
    * corpus grows; the property a `rand()` split lacks). `splits` are
    * (name, percent) with percents summing to ≤ 100; rows past the sum
    * fall into the last split. Scan-side projection, no shuffle. */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100, "split percents must sum to <= 100")
    val bucket =
      graft.functions.GraftFunctions.md5Prefix32(col(idCol).cast("string")) % 100
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val assign = splits.zip(cum).init.foldRight(lit(splits.last._1)) {
      case (((name, _), hi), acc) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** 80/10/10 split of documents. */
  def docSplits(spark: SparkSession, dir: String): DataFrame =
    hashSplit(Tables.load(spark, dir, "documents"),
      "doc_id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("lang"), col("split"))

  /** Deterministic corpus shuffle with EXACT global positions — the
    * per-epoch reshuffle a training pipeline needs (order differs per
    * `seed`, is a pure function of (seed, id), and reproduces across
    * runs/engines/partitionings — none of which `rand()` or
    * `repartition` gives).
    *
    * Global rank without a single-partition sort: the 32-bit shuffle key
    * is RANGE-bucketed by its high bits (floor division — bucket order ≡
    * key order), per-bucket ranks come from a window partitioned BY
    * bucket (each sorts only its own slice), and bucket offsets are a
    * running sum over the `buckets`-row count table (tiny window) joined
    * back by broadcast. pos = offset + rank − 1: exactly
    * `row_number() OVER (ORDER BY key, id) − 1`, with the work of a
    * bucketed sort. Deliberately avoids `repartitionByRange`, whose
    * sampled boundaries are not reproducible cross-engine. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: String = "epoch0", buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      "buckets must be a power of two (range-aligned key prefix), bounded " +
        "so the dense offset literal stays plan-sized (8 B per bucket)")
    val key = graft.functions.GraftFunctions.md5Prefix32(
      concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val perBucket = (1L << 32) / buckets
    val withB = df.select(col(idCol), key.as("__k"))
      .withColumn("__b", (col("__k") / lit(perBucket)).cast("long"))
    // Bucket offsets are materialized DRIVER-SIDE (≤ `buckets` rows of
    // counts — a bounded collect, same legitimacy class as broadcast
    // literals) and re-enter the plan as a literal map probed per row.
    // The price is one extra column-pruned scan of the id projection; the
    // alternative — persisting (id, key, bucket) so two plan branches
    // share one scan — caches a whole-corpus slice for the session (a
    // per-EPOCH reshuffle API would leak those blocks on every call) and
    // at 100 TB the re-scan is the cheaper side of that trade.
    val counts = withB.groupBy("__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // DENSE offset array indexed by bucket, not a Map literal: a map
    // literal plans as GetMapValue, which scans its key array per row
    // (~buckets/2 comparisons on the hot path); the dense array is an
    // O(1) ordinal fetch. Empty buckets carry the running offset so the
    // array is total over [0, buckets).
    val dense = new Array[Long](buckets)
    var run = 0L
    var ci = 0
    var b = 0
    while (b < buckets) {
      dense(b) = run
      if (ci < counts.length && counts(ci)._1 == b) { run += counts(ci)._2; ci += 1 }
      b += 1
    }
    val ranked = withB.withColumn("__r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("__b").orderBy(col("__k"), col(idCol))).cast("long"))
    ranked.select(
      (element_at(typedlit(dense.toSeq), (col("__b") + 1).cast("int")) +
        col("__r") - 1).as("pos"),
      col(idCol))
  }

  /** Dense 0-based rank of `df` by a DISTINCT long key — `row_number()
    * OVER (ORDER BY keyCol) − 1` without the single-partition global
    * sort that window spells (one task sorting the whole input — the
    * unbounded-single-task class [[deterministicShuffle]] exists to
    * avoid). Same device, with the key itself as the order: keys are
    * RANGE-bucketed by fixed-width intervals derived from (min, max)
    * (floor-interval bucketing is order-preserving, so bucket order ≡
    * key order for ANY interval width), per-bucket ranks come from a
    * window partitioned BY bucket (each task sorts only its slice), and
    * bucket offsets re-enter as a dense plan literal built from the
    * ≤`buckets`-row count table (a bounded collect — the broadcast-
    * literal legitimacy class). offset + rank − 1 equals the global
    * row_number EXACTLY, independent of `buckets` (spec-pinned law).
    *
    * Contract: `keyCol` values must be DISTINCT (ranks among equal keys
    * would be partition-order-dependent; every call site ranks a group
    * key) and NON-NULL — enforced with a fail-fast require piggybacked
    * on the min/max pass: a null key's quotient is null, `least` skips
    * nulls, and the row would silently land in the top bucket with a
    * WRONG global rank rather than an error (round-16 advice fix).
    * The input is scanned three times (min/max, counts, final) —
    * callers pass checkpointed/landed k-row tables, never raw plans.
    * The interval arithmetic runs in decimal(38,0) so a full-Long-range
    * key span cannot overflow the subtraction. Returns `df`'s columns
    * plus `outCol`. */
  def denseRankByKey(df: DataFrame, keyCol: String, outCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      "buckets bounded so the dense offset literal stays plan-sized")
    val mm = df.agg(min(col(keyCol)).cast("long"), max(col(keyCol)).cast("long"),
      (count(lit(1)) - count(col(keyCol))).as("__nulls")).head()
    require(mm.getLong(2) == 0L,
      s"denseRankByKey: $keyCol carries ${mm.getLong(2)} null keys — a null " +
        "quotient would silently rank into the top bucket (contract: non-null)")
    if (mm.isNullAt(0)) return df.withColumn(outCol, lit(0L)) // empty input
    val (mn, mx) = (mm.getLong(0), mm.getLong(1))
    // width = floor(span/buckets) + 1 > span/buckets. It can exceed
    // Long.MaxValue (full-Long-range span with buckets = 1), so it enters
    // the plan as an exact decimal literal, never a truncated long.
    val width = (BigInt(mx) - BigInt(mn)) / buckets + 1
    val keyDec = col(keyCol).cast("decimal(38,0)")
    // The quotient divides at Spark's decimal scale (HALF_UP at 6 dp) —
    // NOT an exact floor division: a key within 5e-7 widths of a bucket
    // boundary can round across it. That is harmless BY CONSTRUCTION:
    // the rank law needs the bucketing to be (a) monotone in the key
    // (rounding a monotone quotient is monotone) and (b) the same
    // expression in the counts pass and the final plan — not any
    // particular boundary placement. Only the array bound needs the
    // clamp: the top key's quotient can round up to exactly `buckets`.
    val withB = df.withColumn("__b",
      least(
        floor((keyDec - lit(mn).cast("decimal(38,0)")) /
          lit(new java.math.BigDecimal(width.bigInteger))),
        lit(buckets - 1).cast("long")).cast("int"))
    val counts = withB.groupBy("__b").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val dense = new Array[Long](buckets)
    var run = 0L; var ci = 0; var b = 0
    while (b < buckets) {
      dense(b) = run
      if (ci < counts.length && counts(ci)._1 == b) { run += counts(ci)._2; ci += 1 }
      b += 1
    }
    withB.withColumn("__r",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("__b").orderBy(col(keyCol))).cast("long"))
      .withColumn(outCol,
        element_at(typedlit(dense.toSeq), col("__b") + 1) + col("__r") - 1)
      .drop("__b", "__r")
  }

  /** CORRECTNESS instantiation: epoch-0 shuffle order of documents. */
  def docShuffle(spark: SparkSession, dir: String): DataFrame =
    deterministicShuffle(
      Tables.load(spark, dir, "documents").select("doc_id"), "doc_id")

  /** Leakage-safe train/val/test split — the splitting rule a training
    * pipeline actually needs: a document and its NEAR-DUPLICATES must
    * land in the same split, or evaluation leaks training text (the
    * public dedup literature's cross-split contamination problem).
    * Composition: near-dup pairs ([[Dedup.minhashLshPairs]]) →
    * connected components ([[Dedup.connectedComponents]]) → every doc
    * keyed by its component id (own id when un-paired) → [[hashSplit]]
    * ON THE COMPONENT, so the whole cluster moves together and the
    * assignment stays append-stable like every hash split. */
  def leakFreeSplits(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.plantedNearDocs(spark, dir)
    val comps = Dedup.connectedComponents(
      Dedup.minhashLshPairs(docs, "doc_id", "text"))
    val assigned = docs.select("doc_id")
      .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    hashSplit(assigned, "component",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
  }
}
