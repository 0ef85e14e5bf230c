package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Cdc

/** Streaming snapshot maintenance — the streaming face of
  * [[graft.operators.Cdc]]: fold a keyed I/U/D change stream into a
  * continuously-current Parquet snapshot via `foreachBatch`.
  *
  * Durability contract (exactly-once effective state):
  *  - each micro-batch writes the NEXT snapshot to its own generation
  *    directory `gen-<batchId>` and then atomically re-points a one-line
  *    `_latest` marker (temp file + rename) — readers never observe a
  *    half-written snapshot (the swap-on-success rule, same as
  *    Compaction's contract);
  *  - on restart Spark replays the last uncommitted batch with the SAME
  *    batch id: if the marker already names `gen-<batchId>` the batch is
  *    skipped (the write+point completed; re-applying would read the
  *    directory being overwritten), otherwise the replay recomputes from
  *    the previous generation — either way the final state is the one
  *    fold of every batch in order;
  *  - generations older than the previous one are pruned after the point.
  *
  * Ordering contract (standard CDC ingestion): within a micro-batch the
  * highest `seqCols` change per key wins (Cdc.applyChangelog); across
  * batches, arrival order wins — a per-key monotone sequence feed is the
  * upstream's contract, as with any log-compacted changelog consumer.
  *
  * Scale shape per batch: one two-phase `max_by` collapse of the batch
  * (small), one left-anti join against the previous snapshot (broadcast
  * of the collapsed change set in the common case), one columnar write.
  * The snapshot never shuffles.
  */
object StreamUpsert {

  private val Marker = "_latest"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Name of the current committed generation, if any. */
  def latestGen(spark: SparkSession, snapshotDir: String): Option[String] = {
    val f = fs(spark, snapshotDir)
    val m = new Path(snapshotDir, Marker)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val s = scala.io.Source.fromInputStream(in).mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  private def pointTo(spark: SparkSession, snapshotDir: String, gen: String): Unit = {
    val f = fs(spark, snapshotDir)
    val tmp = new Path(snapshotDir, s"$Marker.tmp")
    val m = new Path(snapshotDir, Marker)
    val out = f.create(tmp, true)
    try out.write(gen.getBytes("UTF-8")) finally out.close()
    if (f.exists(m)) f.delete(m, false)
    if (!f.rename(tmp, m))
      throw new java.io.IOException(s"could not point $m at $gen")
  }

  /** The current committed snapshot (empty, schema-less read error if no
    * generation committed yet — use the overload with a template for
    * cold starts). */
  def currentSnapshot(spark: SparkSession, snapshotDir: String): DataFrame =
    spark.read.parquet(snapshotDir + "/" +
      latestGen(spark, snapshotDir).getOrElse(
        throw new IllegalStateException(s"no committed snapshot under $snapshotDir")))

  /** Start folding `changes` (a streaming DataFrame carrying the key,
    * sequence, op, and payload columns) into `snapshotDir`. The base
    * schema is the change schema minus `seqCols` and `opCol`. */
  def start(changes: DataFrame, snapshotDir: String, checkpoint: String,
      keyCols: Seq[String], seqCols: Seq[String], opCol: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val gen = s"gen-$id"
        if (!latestGen(spark, snapshotDir).contains(gen)) {
          val baseCols = batch.columns.toSeq
            .filterNot(c => seqCols.contains(c) || c == opCol)
          val base = latestGen(spark, snapshotDir) match {
            case Some(g) => spark.read.parquet(s"$snapshotDir/$g")
            case None    => batch.select(baseCols.map(batch(_)): _*).limit(0)
          }
          val prev = latestGen(spark, snapshotDir)
          Cdc.applyChangelog(base, batch, keyCols, seqCols, opCol)
            .write.mode(SaveMode.Overwrite).parquet(s"$snapshotDir/$gen")
          pointTo(spark, snapshotDir, gen)
          // prune everything but {current, previous} — previous survives
          // one extra generation so an in-flight reader of the old marker
          // value still finds its files
          val f = fs(spark, snapshotDir)
          val keep = Set(gen) ++ prev
          f.listStatus(new Path(snapshotDir))
            .filter(s => s.isDirectory && !keep(s.getPath.getName))
            .foreach(s => f.delete(s.getPath, true))
        }
        ()
      }
      .start()
  }
}
