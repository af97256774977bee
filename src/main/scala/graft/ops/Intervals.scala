package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (key, start, end) relations — the gaps-and-islands
  * shape: coalesce overlapping/touching intervals per key into maximal
  * covered "islands". The workhorse behind wear-time coverage, availability
  * windows, and outage accounting.
  *
  * Scale design: ONE exchange total. Everything runs inside a single
  * `Window.partitionBy(key).orderBy(start, end)` pass — the island boundary
  * flag is a running-max comparison, the island id a running sum of flags —
  * and the follow-up per-(key, island) aggregate is satisfied by the same
  * hash partitioning (grouping keys are a superset of the partition key, so
  * Catalyst plans no second exchange; pinned in PlanIntegritySpec). No
  * joins, no collect, no state beyond the window's sort buffer.
  */
object Intervals {

  /** Coalesce per-`key` intervals `[start, end]` into islands: a new island
    * opens when an interval's start exceeds the running max end of every
    * earlier interval (touching endpoints merge — `start == prev end` joins
    * the island). Returns one row per island:
    * (key, island_id, island_start, island_end, n_intervals), island_id
    * numbered 1..k per key in start order.
    */
  def coalesce(df: DataFrame, key: Column, start: Column,
               end: Column): DataFrame = {
    val base = df.select(key.as("key"), start.as("s"), end.as("e"))
    val w = Window.partitionBy("key").orderBy("s", "e")
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = base.withColumn("new_island",
      when(col("s") <= prevMax, lit(0L)).otherwise(lit(1L)))
    val islands = flagged.withColumn("island_id",
      sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col("key"), col("island_id"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** The complement of [[coalesce]]: per key, the SILENT stretches between
    * maximal covered islands — "when was this device NOT reporting?", the
    * outage/wear-gap census. Each gap runs from an island's end to the
    * next island's start; by island maximality the gap is strictly
    * positive, and a key with one island emits no rows.
    *
    * Output: (key, gap_seq = preceding island's id, gap_start, gap_end).
    *
    * Shape at 100 TB: [[coalesce]]'s single key-partitioned exchange plus
    * one lead() over the (already tiny) per-key ISLAND relation — gap
    * discovery costs nothing beyond the coalesce itself.
    */
  def gaps(df: DataFrame, key: Column, start: Column,
           end: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy("island_id")
    coalesce(df, key, start, end)
      .withColumn("next_start", lead(col("island_start"), 1).over(w))
      .filter(col("next_start").isNotNull)
      .select(col("key"), col("island_id").as("gap_seq"),
        col("island_end").as("gap_start"), col("next_start").as("gap_end"))
  }

  /** Generic interval-OVERLAP join: all (left, right) interval pairs on
    * the same key whose CLOSED ranges intersect (l_s ≤ r_e ∧ r_s ≤ l_e)
    * — interval×interval, where the production wear-period join
    * ([[graft.etl.Stages]] resolvePatients) is point-in-interval. The
    * coverage-vs-outage / campaign-vs-session / shift-vs-incident
    * reconciliation primitive.
    *
    * The inequality pair never runs as a raw theta-join: both sides
    * explode to the `bucketWidth`-sized bucket range they span, pair
    * through the (key, bucket) EQUI-join, verify the exact predicate, and
    * dedup (an overlap spanning several buckets matches in each — the
    * distinct is pair-keyed). Bucket fan-out per interval is
    * span/width + 1, so pick `bucketWidth` near the typical span; pair
    * work is bounded by per-bucket density, never |L|·|R| per key.
    * Bounds are nonneg longs with start ≤ end (the day-number domain;
    * `div` truncation ≡ floor there).
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  leftId: String, leftStart: String, leftEnd: String,
                  rightId: String, rightStart: String, rightEnd: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def buckets(df: DataFrame, id: String, s0: String, e0: String,
                side: String) =
      df.select(col(keyCol).as("_k"), col(id).as(s"${side}_id"),
          col(s0).cast("long").as(s"${side}_s"),
          col(e0).cast("long").as(s"${side}_e"))
        // domain contract ENFORCED, not assumed: a negative bound makes
        // `div` truncation diverge from floor (wrong bucket → silently
        // MISSED pairs), and end < start is a malformed interval. The
        // guard rides the sequence's start bound — a consumed expression
        // column pruning can never drop
        .withColumn("_b", explode(sequence(
          when(col(s"${side}_s") < 0L ||
              col(s"${side}_e") < col(s"${side}_s"),
            raise_error(concat(
              lit(s"overlapJoin: need 0 <= $side start <= end, got ["),
              col(s"${side}_s").cast("string"), lit(", "),
              col(s"${side}_e").cast("string"), lit("]"))))
            .otherwise(expr(s"${side}_s div ${bucketWidth}L")),
          expr(s"${side}_e div ${bucketWidth}L"))))
    val l = buckets(left, leftId, leftStart, leftEnd, "l")
    val r = buckets(right, rightId, rightStart, rightEnd, "r")
    l.join(r, Seq("_k", "_b"))
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select(col("_k").as(keyCol), col("l_id"), col("r_id"),
        col("l_s"), col("l_e"), col("r_s"), col("r_e"))
      .distinct()
  }
}
