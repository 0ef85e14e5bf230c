package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
