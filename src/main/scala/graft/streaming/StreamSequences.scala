package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Continuously-maintained per-user training sequences — the streaming
  * face of [[graft.operators.Analytics.userEventSequences]] (the online
  * feature-store shape: every user's current head-of-history, updated per
  * micro-batch). State per user is the same bounded structure the batch
  * operator's TopKPerKey heaps hold: the `maxLen` SMALLEST (ts, event_id)
  * events seen so far plus a running total — NOT an append log, so state
  * is bounded by contract and, crucially, the fold is ARRIVAL-ORDER
  * INSENSITIVE: a late event that belongs in the head displaces the
  * current tail whenever it arrives, so after any interleaving of
  * arrivals the emitted history equals the batch operator's answer on
  * the same event set (StreamSequencesSpec drives exactly that
  * equivalence). Update output mode: each batch re-emits the histories
  * it changed; downstream keeps the latest row per user.
  */
object StreamSequences {

  case class Event(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  /** (millis, sub-second nanos, id) — lexicographic order ≡ (ts, id). */
  case class Kept(millis: Long, nanos: Int, event_id: Long, event_type: String)
  case class HistState(kept: List[Kept], nEvents: Long)
  case class History(user_id: Long, n_events: Long, seq_len: Long, seq: String)

  def userHistories(events: Dataset[Event], maxLen: Int): Dataset[History] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HistState, History](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[HistState]) =>
          val prev = state.getOption.getOrElse(HistState(Nil, 0L))
          var n = prev.nEvents
          val arrived = rows.map { e =>
            n += 1
            Kept(e.ts.getTime, e.ts.getNanos % 1000000, e.event_id, e.event_type)
          }.toList
          val bounded = (arrived ++ prev.kept)
            .sortBy(k => (k.millis, k.nanos, k.event_id))
            .take(maxLen)
          state.update(HistState(bounded, n))
          Iterator.single(History(
            uid, n, bounded.length.toLong,
            bounded.map(_.event_type).mkString("|")))
      }
  }

  /** LAND the continuously-maintained histories as a queryable snapshot —
    * the feature-store READ path the Update-mode row stream alone lacks:
    * each micro-batch's changed histories upsert into the
    * [[StreamUpsert]] generation-dir snapshot (gen-<batchId> + atomic
    * `_latest` marker), so readers always see one committed "latest
    * history per user" table, across restarts.
    *
    * The composition is exact because a History row is a FULL replacement
    * of its user's row (the fold in [[userHistories]] already carries all
    * state), and `n_events` is strictly increasing per user — the natural
    * CDC sequence column: a replayed batch's rows can never regress a row
    * that a later batch already landed. Scale shape per batch: the
    * changed-user set (micro-batch-sized) broadcast-anti-joins the
    * snapshot; the snapshot itself never shuffles. */
  def startLanded(events: Dataset[Event], maxLen: Int, snapshotDir: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val hist = userHistories(events, maxLen).toDF()
      .withColumn("__seq", col("n_events"))
      .withColumn("__op", lit("U"))
    StreamUpsert.start(hist, snapshotDir, checkpoint,
      keyCols = Seq("user_id"), seqCols = Seq("__seq"), opCol = "__op",
      trigger, outputMode = "update")
  }

  /** The landed "latest history per user" table (current committed
    * generation). */
  def latestHistories(spark: SparkSession, snapshotDir: String): DataFrame =
    StreamUpsert.currentSnapshot(spark, snapshotDir)

  /** Event transitions DERIVED from the maintained heads — the
    * OUT-OF-ORDER-safe streamed form of
    * [[graft.operators.Analytics.eventTransitions]]: a naive streaming
    * count of adjacent arrivals is wrong the moment a late event belongs
    * in the middle of someone's history (it silently replaces two true
    * transitions with two false ones), but the landed histories are
    * already arrival-order-insensitive (the [[userHistories]] fold), so
    * reading adjacent pairs OFF the heads inherits that correctness for
    * free — the composition is the fix. Bounded by contract: ≤ maxLen−1
    * pairs per user, a row-local explode off the snapshot. */
  def transitions(spark: SparkSession, snapshotDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    latestHistories(spark, snapshotDir)
      .select(split(col("seq"), "\\|").as("s"))
      .filter(size(col("s")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("s")) - 1),
        j => struct(element_at(col("s"), j).as("from_type"),
          element_at(col("s"), j + 1).as("to_type")))).as("p"))
      .groupBy(col("p.from_type").as("from_type"),
        col("p.to_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** The stationary mix of the streamed chain — the
    * [[graft.operators.Analytics.stationaryEventMix]] power-iteration
    * tail over [[transitions]]' counts. Served entirely from the landed
    * snapshot; raw events are never re-read. */
  def stationaryMix(spark: SparkSession, snapshotDir: String,
      iters: Int = 5): DataFrame = {
    import org.apache.spark.sql.functions._
    val trans = transitions(spark, snapshotDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = latestHistories(spark, snapshotDir)
      .select(explode(split(col("seq"), "\\|")).as("t"))
      .filter(length(col("t")) > 0)
      .distinct().collect().map(_.getString(0)).sorted
    graft.operators.Analytics.stationaryFromCounts(spark, trans, types, iters)
  }
}
