package graft.operators

import graft.SparkTestBase
import java.sql.Timestamp

/** As-of join semantics on a hand-built timeline: nearest prior match,
  * at-or-before inclusivity, no-prior → NULL, per-user isolation.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("nearestPrior picks the latest right row at or before each left row") {
    val events = Seq(
      // user 1: click(1) 09:00, error(2) 09:05 → 1; click(3) 09:10,
      // error(4) 09:10 (equal ts → at-or-before includes it) → 3;
      // error(5) 09:20 → 3
      (1L, ts("2024-01-01 09:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 09:05:00"), 1L, "error", 0.0),
      (3L, ts("2024-01-01 09:10:00"), 1L, "click", 0.0),
      (4L, ts("2024-01-01 09:10:00"), 1L, "error", 0.0),
      (5L, ts("2024-01-01 09:20:00"), 1L, "error", 0.0),
      // user 2: error before any click → NULL prior; other types ignored
      (6L, ts("2024-01-01 09:00:00"), 2L, "error", 0.0),
      (7L, ts("2024-01-01 08:00:00"), 2L, "view", 0.0),
      (8L, ts("2024-01-01 09:30:00"), 2L, "click", 0.0),
      (9L, ts("2024-01-01 09:40:00"), 2L, "error", 0.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")

    val got = AsOfJoin.nearestPrior(events, "error", "click")
      .select("event_id", "prior_id", "gap_us")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(got == Set(
      (2L, Some(1L), Some(300L * 1000000)),
      (4L, Some(3L), Some(0L)),
      (5L, Some(3L), Some(600L * 1000000)),
      (6L, None, None),
      (9L, Some(8L), Some(600L * 1000000)),
    ), s"got $got")
  }
}
