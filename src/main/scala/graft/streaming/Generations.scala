package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Shared listing for the batch-id-generation directory layout
  * ([[StreamNearDedup]], [[DeadLetter]]): a sink directory holds one
  * subdirectory per micro-batch, written with idempotent Overwrite so
  * Spark's replay of the last uncommitted batch rewrites it
  * byte-identically; readers consider only `_SUCCESS`-committed
  * generations, so a half-written directory from a crash is invisible
  * until its replay completes it. */
private[streaming] object Generations {

  def committed(spark: SparkSession, dir: String, prefix: String): Seq[String] = {
    val root = new Path(dir)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix) &&
        f.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName).toSeq.sorted
  }

  /** Union-read of an explicit generation-name list (callers that filter
    * the committed set first — e.g. manifest exclusion — share this one
    * path-building site); fails fast on an empty list. */
  def readNames(spark: SparkSession, dir: String, names: Seq[String],
      prefix: String): org.apache.spark.sql.DataFrame = {
    require(names.nonEmpty, s"no committed '$prefix' generations under $dir")
    spark.read.parquet(names.map(p => s"$dir/$p"): _*)
  }

  /** Union-read of every committed generation; fails fast when none has
    * committed yet (callers with a cold-start schema pass a template to
    * their own wrapper instead). */
  def read(spark: SparkSession, dir: String, prefix: String)
      : org.apache.spark.sql.DataFrame =
    readNames(spark, dir, committed(spark, dir, prefix), prefix)

  /** Fold accumulated `gen-<id>` generations under `dir` into one
    * `gen-compact-<epoch>`: union committed sources (prior compactions +
    * all batch generations EXCEPT the newest — replay protection: an
    * uncommitted trailing batch rewrites its own generation on replay,
    * so its rows must not also live in a fold), full-row dropDuplicates,
    * write the fold, then delete sources. Interruption between the fold
    * write and the source deletes leaves exact duplicate rows; the next
    * fold's dropDuplicates collapses them, so readers that either
    * full-row-dedup or are duplication-inert self-heal. MUST run inside
    * the serial foreachBatch loop (the `compactEvery` hooks) — the
    * single-maintenance-job contract. */
  def compactFold(spark: SparkSession, dir: String): Unit = {
    val gens = committed(spark, dir, "gen-")
      .filterNot(_.startsWith("gen-compact-"))
    val priorCompactions = committed(spark, dir, "gen-compact-")
    val newestBatchGen = gens
      .flatMap(g => g.stripPrefix("gen-").toLongOption.map((_, g)))
      .maxByOption(_._1).map(_._2)
    val sources = priorCompactions ++ gens.filterNot(newestBatchGen.contains)
    if (sources.size > 1) {
      val epoch = priorCompactions
        .flatMap(_.stripPrefix("gen-compact-").toLongOption)
        .maxOption.getOrElse(0L) + 1
      spark.read.parquet(sources.map(g => s"$dir/$g"): _*)
        .dropDuplicates()
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$dir/gen-compact-$epoch")
      val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      sources.foreach(g => f.delete(new Path(dir, g), true))
    }
  }

  /** Name of the published-view marker file under a generation dir. */
  val Marker = "_latest"

  /** Atomically (re-)point `dir/_latest` at generation `name`: temp file +
    * overwrite-capable rename, so the marker transitions old→new in one
    * operation and never disappears — readers (and restart recovery)
    * never observe "no committed generation" mid-swap. Shared by
    * [[StreamUpsert]]'s snapshots and [[StreamAnomaly]]'s board. */
  def pointMarker(spark: SparkSession, dir: String, name: String): Unit = {
    val tmp = new Path(dir, s"$Marker.tmp")
    val m = new Path(dir, Marker)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(m.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(m), Options.Rename.OVERWRITE)
  }

  /** The marker's current generation name, if the marker exists and is
    * non-empty. */
  def readMarker(spark: SparkSession, dir: String): Option[String] = {
    val m = new Path(dir, Marker)
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }
}
