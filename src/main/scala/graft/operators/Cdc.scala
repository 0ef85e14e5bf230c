package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Changelog application (CDC merge / upsert) — the maintenance operation
  * every landed snapshot table needs: fold a stream of keyed
  * insert/update/delete changes into the current snapshot. The reference
  * only ever appends (spark/app/spark_processing.py:151-162); this is the
  * beyond-reference mutation path for tables with a primary key.
  *
  * Scale shape (100 TB snapshot, ≪-sized change window):
  *  - the changelog collapses to one winning change per key with a
  *    two-phase `max_by` hash aggregate — one row per CHANGED key crosses
  *    the shuffle, never the raw changelog, never the snapshot;
  *  - the snapshot is touched by exactly one left-anti join on the key
  *    (broadcast-chosen by AQE when the collapsed change set is small —
  *    the common case; key-aligned shuffle otherwise, and exchange-free
  *    when the snapshot is bucketed on the key via Layout.writeBucketed);
  *  - no window function ever runs over the snapshot, and the unmatched
  *    snapshot rows stream through untouched.
  */
object Cdc {

  /** Apply an I/U/D changelog to a keyed snapshot: the change with the
    * highest `seqCols` (lexicographic) per key wins; a winning delete
    * (`opCol` = "D") removes the key, any other winning op replaces-or-
    * inserts the row; keys without changes pass through.
    *
    * `changes` must carry the key, the sequence columns, `opCol`, and
    * every non-key column of `base` (the replacement payload).
    */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String): DataFrame = {
    val payload = base.columns.toSeq.filterNot(keyCols.contains)
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        struct(payload.map(col) :+ col(opCol).as("__op"): _*),
        struct(seqCols.map(col): _*)).as("__last"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__last.`$c`").as(c))
        :+ col("__last.__op").as("__op"): _*)
    // NULL-op guard: `col =!= "D"` is null-FALSE, so a winning change with
    // a NULL op would be anti-joined out of the base yet excluded from the
    // upserts — a silent delete. Treat NULL as the non-delete default ("U")
    // so malformed changelog input degrades to an upsert, not data loss.
    val upserts = latest.filter(coalesce(col("__op"), lit("U")) =!= lit("D")).drop("__op")
    base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Diff two keyed snapshots — which keys were added, deleted, or
    * updated between generations (the audit/monitoring complement of
    * [[applyChangelog]]: apply moves a snapshot forward, diff explains
    * what moved). Unchanged keys drop out of the result.
    *
    * Scale shape: each side reduces to (key, xxhash64(payload struct))
    * scan-side — 8 bytes per row cross the full-outer join's shuffle, the
    * payload never does; on key-bucketed snapshots the join is
    * exchange-free. The hash equality stands in for payload equality
    * (64-bit collision odds are negligible and the alternative shuffles
    * the whole payload; callers needing certainty re-verify the
    * `updated` subset with a payload join — it is small by contract). */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val payload = before.columns.toSeq.filterNot(keyCols.contains)
    def hashed(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+
        xxhash64(struct(payload.map(col): _*)).as(as): _*)
    hashed(before, "__hb").join(hashed(after, "__ha"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__hb").isNull, lit("added"))
          .when(col("__ha").isNull, lit("deleted"))
          .when(col("__hb") =!= col("__ha"), lit("updated"))
          .as("change"): _*)
      .filter(col("change").isNotNull)
  }

  /** CORRECTNESS-entry instantiation: two deterministic event-keyed
    * snapshot generations (before = event_id % 3 ≠ 0; after =
    * event_id % 4 ≠ 0 with every 7th value bumped) so all three change
    * kinds are non-vacuous by construction. */
  def eventsDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val before = ev.filter(col("event_id") % 3 =!= 0)
    val after = ev.filter(col("event_id") % 4 =!= 0)
      .withColumn("value",
        when(col("event_id") % 7 === 0, round(col("value") * 1.1, 6))
          .otherwise(col("value")))
    snapshotDiff(before, after, Seq("event_id"))
  }

  /** SCD Type-2 dimension history from a keyed changelog — the versioned
    * complement of [[applyChangelog]] (which keeps only the latest row per
    * key, this keeps them ALL with validity intervals): one output row per
    * surviving (key, change) with [valid_from, valid_to) half-open
    * validity, where valid_to is the NEXT change's time (NULL while
    * current) and a delete closes the previous version's interval without
    * opening one of its own — the standard Kimball type-2 contract.
    *
    * CONTRACT: `seqCols` is unique per key (a changelog position);
    * `timeCol` (usually seqCols' head) supplies the validity boundary.
    *
    * Scale shape: rows = changes — the snapshot never enters the plan;
    * ONE hash distribution on the key serves both the per-key `lead`
    * window (partition-local sort over each key's few versions, no global
    * sort) and the delete filter riding the same projection. At 100 TB of
    * accumulated history, run it on the change window and stitch against
    * the landed history's open intervals. */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], timeCol: String, opCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(seqCols.map(col): _*)
    val payload = changes.columns.toSeq
      .filterNot(c => c == opCol || c == timeCol)
    changes
      .withColumn("__valid_to", lead(col(timeCol), 1).over(w))
      .filter(coalesce(col(opCol), lit("U")) =!= lit("D"))
      .select(payload.map(col)
        :+ col(timeCol).as("valid_from")
        :+ col("__valid_to").as("valid_to")
        :+ col("__valid_to").isNull.as("is_current"): _*)
  }

  /** CORRECTNESS instantiation: the [[userSnapshot]] changelog (event_id
    * % 3 = 0, error ⇒ delete) versioned instead of collapsed. */
  def userHistory(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.load(spark, dir, "events")
      .filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
    scd2History(changes, keyCols = Seq("user_id"),
      seqCols = Seq("ts", "event_id"), timeCol = "ts", opCol = "op")
  }

  /** CORRECTNESS-entry instantiation over the synthetic tables: snapshot =
    * keep-first-per-user events ([[Dedup.exactKeepFirst]]); changelog =
    * the deterministic `event_id % 3 = 0` subset, sequenced by
    * (ts, event_id), where an `error` event deletes the user's row and
    * anything else upserts it. */
  def userSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
    val base = Dedup.exactKeepFirst(events)
    val changes = events
      .filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U")).as("op"))
    applyChangelog(base, changes, keyCols = Seq("user_id"),
      seqCols = Seq("ts", "event_id"), opCol = "op")
  }
}
