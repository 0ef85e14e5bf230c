package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic negative-pair sampling for contrastive training data —
  * "give every document m pseudo-random partners from elsewhere in the
  * corpus" (the negatives in a contrastive/embedding training batch),
  * WITHOUT a cartesian product and WITHOUT `rand()`.
  *
  * Design: hash every doc into one of B buckets, pick one representative
  * per bucket (min id — deterministic), and have each doc draw its m
  * partners from m hash-chosen OTHER buckets' representatives. Every
  * decision is a pure function of (id, j), so the output is reproducible
  * across runs, engines (the DuckDB oracle recomputes it), retries, and
  * partitionings — the same md5-prefix recipe as
  * [[Relational.stratifiedSample]].
  *
  * Scale shape (100 TB corpus): the representative table is B rows (a
  * constant) → broadcast; the per-doc bucket draw is a scan-side codegen
  * projection; the m-way fan-out is a row-local explode. No shuffle
  * touches the corpus beyond the B-row aggregate; never any all-pairs
  * structure. (A true uniform-over-corpus negative needs a global index —
  * a global sort at scale; bucket representatives are the standard
  * trade: uniform over B well-mixed hash buckets, O(1) state.)
  */
object Contrastive {

  /** 32-bit uniform hash of a string column (md5 prefix — engine-portable). */
  private def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** m deterministic cross-bucket negative partners per row of `docs`.
    * Output: (idCol, j, neg_id) — j in [0, m), neg_id ≠ the row's own
    * bucket representative's bucket, so neg_id ≠ id always. */
  def negativePairs(docs: DataFrame, idCol: String,
      m: Int = 4, buckets: Int = 64): DataFrame = {
    require(m > 0 && buckets > 1, "need m > 0 and at least 2 buckets")
    val withB = docs.select(col(idCol),
      (h32(col(idCol).cast("string")) % buckets).as("__b"))
    val reps = withB.groupBy(col("__b").as("__rep_b"))
      .agg(min(col(idCol)).as("neg_id"))
    val fanned = withB.select(col(idCol), col("__b"),
      explode(array((0 until m).map(j => lit(j.toLong)): _*)).as("j"))
    // target bucket: own + 1 + h(id:j) mod (B-1), mod B — never the own
    // bucket, so a doc can never draw itself
    val probe = fanned.withColumn("__t",
      (col("__b") + lit(1L) +
        h32(concat(col(idCol).cast("string"), lit(":"), col("j").cast("string")))
          % (buckets - 1)) % buckets)
    probe.join(reps, probe("__t") === reps("__rep_b"))
      .select(col(idCol), col("j"), col("neg_id"))
  }

  /** CORRECTNESS instantiation over the documents table. */
  def docNegativePairs(spark: SparkSession, dir: String): DataFrame =
    negativePairs(Tables.load(spark, dir, "documents"), "doc_id")
}
