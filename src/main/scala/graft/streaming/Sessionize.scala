package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom state — the
  * `flatMapGroupsWithState` operator (SURVEY §2.4 lists it as absent from
  * the reference; it is the canonical "state Spark's built-in aggregates
  * can't express" example the BASELINE extensions call for).
  *
  * Semantics: per user, consecutive events closer than `gapMs` belong to
  * one session; a session is emitted once the event-time watermark passes
  * its end + gap (EventTimeTimeout), so output is append-mode and final.
  *
  * Scale: state per key is one (start, end, n, sum) — constant size, no
  * event buffering; keys shuffle once to their state partition and the
  * watermark GCs every expired session, so state is bounded by concurrently
  * ACTIVE users, not total users. The batch-equivalent window-function form
  * lives in [[graft.operators.Sessions]] (same output contract, oracle-
  * checked); this one is for unbounded streams.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** Open-session state: epoch-millis bounds + running aggregates. */
  case class SessionAgg(start: Long, end: Long, n: Long, sum: Double)
  case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  val defaultGapMs: Long = 30L * 60 * 1000

  def sessions(events: Dataset[Event], gapMs: Long = defaultGapMs,
      lateness: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapMs))
  }

  private def toSession(userId: Long, s: SessionAgg): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)

  /** State transition: merge in-gap events into the open session, close
    * sessions whose gap is exceeded within the batch, and arm an
    * event-time timeout at end+gap so the watermark finalizes the rest. */
  private[streaming] def process(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionAgg]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val closed = toSession(userId, state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t - s.end <= gapMs =>
            Some(SessionAgg(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed ::= toSession(userId, s)
            Some(SessionAgg(t, t, 1, e.value))
          case None =>
            Some(SessionAgg(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // timeout must be beyond the current watermark; a session already
        // older than the watermark times out on the next batch
        state.setTimeoutTimestamp(
          math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
      }
      closed.reverseIterator
    }
  }
}
