package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's event stream into sessions at
  * inactivity gaps > `gapMs` — the batch twin of the streaming session
  * windows in `streaming/IncrementalIngest.sessionCounts`, for the
  * backfill/replay side of a lambda deployment.
  *
  * Classic two-window formulation: lag-gap flag, then a running sum of the
  * flags as the session index. Both windows AND the summary aggregation
  * key on the same partition column, so the whole operator is ONE exchange
  * — the groupBy(key, session_idx) reuses the window's hashpartitioning
  * (key is a prefix of the grouping, which satisfies ClusteredDistribution)
  * — pinned in PlanIntegritySpec.
  *
  * NULL keys: `Window.partitionBy` pools all NULL keys into one partition
  * (they would sessionize together as one pseudo-user); callers with
  * nullable keys must filter or coalesce first. `tieCol` makes the
  * in-partition order total when timestamps collide, so session indices
  * are deterministic.
  */
object Sessionize {

  /** Per-event session assignment: input columns + `_tms` (epoch millis)
    * + `session_idx` (1-based, per key, in time order). Fails fast if the
    * input already carries either output column (silently overwriting a
    * previous assignment — e.g. re-sessionizing with a different gap —
    * would hide a caller bug; select them away first).
    *
    * Null ordering is pinned NULLS LAST on both order columns (the repo's
    * oracle-parity convention: Spark defaults nulls FIRST, DuckDB LAST —
    * an unpinned sort would shift every session index after a NULL ts).
    */
  def assignSessions(events: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, gapMs: Long): DataFrame = {
    val clash = events.columns.toSet
      .intersect(Set("_tms", "session_idx", "_graft_new_session"))
    require(clash.isEmpty,
      s"assignSessions output columns already present in input: " +
        s"${clash.mkString(", ")} — drop or rename them first")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_tms").asc_nulls_last, col(tieCol).asc_nulls_last)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lag is NULL on the first event: NULL <= gap is NULL -> otherwise(1),
    // opening the first session — same CASE semantics as the SQL oracle.
    events
      .withColumn("_tms", unix_millis(col(tsCol)))
      .withColumn("_graft_new_session",
        when(col("_tms") - lag(col("_tms"), 1).over(w) <= gapMs, 0L)
          .otherwise(1L))
      .withColumn("session_idx", sum(col("_graft_new_session")).over(run))
      .drop("_graft_new_session")
  }

  /** Session summaries: (key, session_idx, n_events, start_ms, end_ms,
    * duration_ms), one row per session. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gapMs: Long): DataFrame =
    assignSessions(events, keyCol, tsCol, tieCol, gapMs)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_tms")).as("start_ms"),
        max(col("_tms")).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))

  /** Hard-cap sessionization — the GA4/telemetry variant the two-window
    * trick above CANNOT express: a session closes at an inactivity gap >
    * `gapMs` (as [[sessionize]]) OR when the next event would stretch the
    * session past `capMs` measured from its START. The cap makes the
    * recurrence non-associative (every split MOVES the start the next
    * comparison measures from — a steady sub-gap drip under plain gap
    * splitting is one endless session; under the cap it re-anchors every
    * capMs), so no window/aggregate computes it; the honest primitive is
    * the secondary-sort scan (the [[graft.ops.EventAnalytics.tokenBucketAdmit]]
    * family): ONE shuffle on the key, partition-local spillable sort,
    * O(1) state per row — hot keys cost time, not memory. The summary
    * aggregate reuses the scan's key partitioning (key is a grouping
    * prefix), so the whole operator is one exchange.
    *
    * Same numeric-key contract as tokenBucketAdmit: key/id must cast to
    * long (loud raise on a non-castable value — a silently dropped row
    * would shift every later session index); NULL key/ts rows are
    * excluded by documented policy (an event with no time cannot be
    * placed; NULL keys don't belong to anyone); the exclusion applies
    * FIRST. A NULL id on a SURVIVING row raises: the tie column is an
    * integrity requirement on rows that participate, and letting one
    * through would die as an opaque encoder error instead of a named
    * one. (The order is structural — the id check sits in a projection
    * ABOVE the exclusion filter, so it cannot be optimizer-reordered
    * onto excluded rows.)
    *
    * Output: (keyCol, session_idx 1-based, n_events, start_ms, end_ms,
    * duration_ms ≤ capMs by construction).
    */
  def sessionizeCapped(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, gapMs: Long, capMs: Long): DataFrame = {
    require(gapMs >= 1, s"gapMs must be >= 1: $gapMs")
    require(capMs >= 1, s"capMs must be >= 1: $capMs")
    val spark = events.sparkSession
    import spark.implicits._
    def checkedCast(c: Column, what: String) =
      when(c.isNotNull && c.try_cast("long").isNull,
        raise_error(concat(
          lit(s"sessionizeCapped: $what must cast to long, got "),
          c.cast("string"))))
        .otherwise(c.try_cast("long"))
    // the tie column is a data-integrity REQUIREMENT (a null id cannot be
    // ordered): raise, don't exclude — a null id slipping through would
    // die as an opaque encoder error at the Dataset[(Long, Long, Long)]
    // boundary instead of this message. The check lives in a SECOND
    // projection above the key/ts exclusion filter: pushdown substitutes
    // the filter below both projects, so excluded rows provably never
    // reach the raise (one combined select would leave the firing order
    // to the optimizer).
    def checkedId(c: Column) =
      when(c.isNull,
        raise_error(lit(s"sessionizeCapped: $idCol (the tie column) " +
          "must be non-null")))
        .otherwise(checkedCast(c, idCol))
    val base = events
      .select(checkedCast(col(keyCol), keyCol).as("_k"),
        unix_millis(col(tsCol)).as("_ts"),
        col(idCol).as("_rawid"))
      .filter(col("_k").isNotNull && col("_ts").isNotNull)
      .select(col("_k"), col("_ts"), checkedId(col("_rawid")).as("_id"))
      .repartition(col("_k"))
      .sortWithinPartitions(col("_k"), col("_ts"), col("_id"))
      .as[(Long, Long, Long)]
    base.mapPartitions { it =>
      var curKey = 0L
      var started = false
      var sid = 0L
      var startMs = 0L
      var lastTs = 0L
      it.map { case (k, ts, _) =>
        if (!started || k != curKey) {
          curKey = k; started = true; sid = 1L; startMs = ts
        } else if (ts - lastTs > gapMs || ts - startMs > capMs) {
          sid += 1L; startMs = ts
        }
        lastTs = ts
        (k, sid, ts)
      }
    }.toDF(keyCol, "session_idx", "_tms")
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("_tms")).as("start_ms"),
        max(col("_tms")).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }
}
