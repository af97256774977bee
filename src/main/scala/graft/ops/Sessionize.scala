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
}
