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
}
