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
  * one session. Sessions are modeled as INTERVALS and merged with a
  * gap-rule scan over (incoming events ∪ open sessions) sorted by start,
  * so out-of-order events that arrive in a later micro-batch — including
  * ones BEFORE an open session's start — sessionize exactly as the batch
  * window-function form ([[graft.operators.Sessionization]]) would.
  * A session is emitted only once the event-time watermark passes
  * its end + gap (no future row can merge into it), so append-mode output
  * is final, not approximate.
  *
  * Scale: state per key is the list of still-mergeable sessions — bounded
  * by (watermark lateness / gap) + 1, a small constant, with no event
  * buffering; keys shuffle once to their state partition and the watermark
  * GCs every finalized session, so state is bounded by concurrently ACTIVE
  * users, not total users.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** One open session: epoch-millis bounds + running aggregates. */
  case class SessionAgg(start: Long, end: Long, n: Long, sum: Double)
  /** Per-user state: every session the watermark has not yet finalized,
    * kept sorted by start. */
  case class SessionState(sessions: List[SessionAgg])
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
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapMs))
  }

  private def toSession(userId: Long, s: SessionAgg): Session =
    Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)

  /** Gap-rule merge of intervals sorted by start: adjacent intervals closer
    * than the gap coalesce (start widens to the min — a late event earlier
    * than an open session's start must move session_start, the round-3
    * divergence from the batch contract). */
  private[streaming] def gapMerge(sorted: List[SessionAgg], gapMs: Long): List[SessionAgg] =
    sorted.foldLeft(List.empty[SessionAgg]) {
      case (cur :: done, a) if a.start - cur.end <= gapMs =>
        SessionAgg(cur.start, math.max(cur.end, a.end), cur.n + a.n, cur.sum + a.sum) :: done
      case (acc, a) => a :: acc
    }.reverse

  /** Emit every session the watermark has finalized (end + gap behind it:
    * any future non-late row is ≥ watermark and so cannot merge), keep the
    * rest in state with a timeout at the earliest possible next
    * finalization. */
  private def flush(gapMs: Long, userId: Long, sessions: List[SessionAgg],
      state: GroupState[SessionState]): Iterator[Session] = {
    val wm = state.getCurrentWatermarkMs()
    // strictly <: a non-late row at ts == watermark is still admitted by
    // Spark, and at ts - end == gap the batch gap rule merges it — so a
    // session with end + gap == wm is not final yet
    val (fin, open) = sessions.partition(_.end + gapMs < wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessionState(open))
      // timeout must be beyond the current watermark; a session already
      // older than the watermark times out on the next batch
      state.setTimeoutTimestamp(math.max(open.map(_.end).min + gapMs, wm + 1))
    }
    fin.iterator.map(toSession(userId, _))
  }

  /** State transition: interval-merge the batch's events with every open
    * session, then flush what the watermark finalized. */
  private[streaming] def process(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val open = state.getOption.map(_.sessions).getOrElse(Nil)
    if (state.hasTimedOut) flush(gapMs, userId, open, state)
    else {
      val incoming = events.map(e => SessionAgg(e.ts.getTime, e.ts.getTime, 1, e.value))
      val merged = gapMerge(
        (incoming ++ open.iterator).toList.sortBy(a => (a.start, a.end)), gapMs)
      flush(gapMs, userId, merged, state)
    }
  }
}
