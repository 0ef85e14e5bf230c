package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Physical-layout control for landed tables: hash-bucketed (and
  * per-bucket sorted) Parquet via the session catalog.
  *
  * This is the 100 TB shuffle eliminator the one-off query surface can't
  * express: landing a fact table bucketed by its dominant key (events by
  * user_id here; the reference's landed `names` stream would bucket by
  * pseudonym) means every downstream `groupBy(key)` / join-on-key /
  * `row_number over (partition by key)` reads data ALREADY hash-distributed
  * — Catalyst sees the scan's `HashPartitioning(key, n)` satisfies the
  * operator's required distribution and plans NO Exchange. Paying the
  * shuffle once at write time amortizes it over every subsequent query;
  * at 100 TB re-shuffling the fact table per query is the single biggest
  * avoidable cost in the whole system. BucketedLayoutSpec pins the
  * no-Exchange plans; co-bucketed self-joins additionally skip the
  * build-side shuffle of a sort-merge join.
  *
  * Bucket-count choice at scale: buckets ≈ (table size / target partition
  * size ~128-256 MiB), rounded to a multiple of the cluster's parallelism;
  * too few buckets caps scan parallelism, too many makes small files.
  * Skewed keys still skew their bucket — bucketing complements, not
  * replaces, the salting path ([[graft.operators.SaltedAgg]]).
  */
object Layout {

  /** Land `df` as a bucketed, per-bucket-sorted external Parquet table.
    * `sortCols` orders rows within each bucket file — keeps-first dedup and
    * as-of scans become near-sequential reads (and when a bucket lands as
    * a single file, Spark can elide the Sort below a merge join too). */
  def writeBucketed(
      df: DataFrame, table: String,
      bucketCols: Seq[String], sortCols: Seq[String],
      buckets: Int, path: String): Unit = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketCols.head, bucketCols.drop(1): _*)
    val ws =
      if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.drop(1): _*)
      else w
    ws.saveAsTable(table)
  }

  /** Land `df` Z-ordered on two dimensions: range-partition + in-file sort
    * on the Morton z-value of (colA, colB), so every file covers a small
    * RECTANGLE of the (A, B) space and its parquet min/max stats are
    * narrow in BOTH columns — point/range predicates on EITHER dimension
    * skip most files. A linear sort gets this for its leading column only;
    * Z-ordering is the multi-column file-skipping layout (the public
    * technique behind Delta/Iceberg OPTIMIZE ZORDER).
    *
    * `toOrdinal` maps each dimension into int space (defaults to a plain
    * int cast — right when values are already comparable integers like
    * ids, day numbers, bucketed floats; callers with wild ranges supply
    * their own binning). The z-value is a codegen'd scan-side projection
    * ([[graft.functions.ZOrder2]]); the one shuffle is the range exchange
    * every clustered rewrite pays. */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int,
      toOrdinal: Column => Column = _.cast("int")): Unit = {
    require(numFiles > 0, "numFiles must be positive")
    val z = graft.functions.GraftFunctions
      .zOrder2(toOrdinal(col(colA)), toOrdinal(col(colB)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
