package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — the pipeline-observability op that
  * watches an ingest feed: per (key, day) event counts scored against the
  * key's own trailing window (z-score vs the previous `window` days,
  * current day excluded). A device that doubles its rate, or goes quiet,
  * surfaces the day it happens.
  *
  * Engine-portable by construction: the trailing moments are SUMs of
  * integer counts (exact, order-independent) over a RANGE frame; the only
  * floating-point work is a fixed tree of divisions/multiplications and
  * one sqrt on those exact sums — bit-identical across engines, so the
  * z-scores themselves hash-match an oracle (no epsilon compare needed).
  *
  * One shuffle (the day aggregate); the window reuses its partitioning.
  */
object Anomaly {

  /** @param counts     (keyCols, dayCol, n_events) — build with
    *                    [[dailyCounts]] or any equivalent aggregate
    * @param window     trailing days in the baseline (RANGE frame, so
    *                    gaps in the day sequence are handled by VALUE,
    *                    not row position)
    * @param minPeriods baseline days required before scoring (a 1-day
    *                    history is noise, not a baseline)
    */
  def rateAnomalies(counts: DataFrame, keyCols: Seq[String],
                    dayCol: String, window: Int = 7, minPeriods: Int = 3,
                    threshold: Double = 3.0): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minPeriods >= 2, s"minPeriods must be >= 2 (variance), got $minPeriods")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(dayCol))
      .rangeBetween(-window.toLong, -1L)
    val c = col("n_events").cast("double")
    val n = count(lit(1)).over(w).cast("double")
    val sx = sum(col("n_events")).over(w).cast("double")
    val sxx = sum(col("n_events") * col("n_events")).over(w).cast("double")
    // sample variance from exact sums; the expression TREE is part of the
    // cross-engine contract (same ops in the same order → same bits)
    val mean = sx / n
    val variance = (sxx - sx * sx / n) / (n - lit(1.0))
    val z = when(n >= minPeriods && variance > 0, (c - mean) / sqrt(variance))
    counts
      .withColumn("trailing_days", count(lit(1)).over(w))
      .withColumn("z_score", z)
      .withColumn("is_anomaly",
        coalesce(abs(col("z_score")) > threshold, lit(false)))
  }

  /** Per-(key, day) event counts from a raw feed; `day` is the epoch-day
    * of `tsMillis` (integer division — exact in every engine).
    */
  def dailyCounts(events: DataFrame, keyCols: Seq[String],
                  tsMillis: Column): DataFrame =
    events
      .withColumn("day", floor(tsMillis / lit(86400000L)).cast("long"))
      .groupBy((keyCols :+ "day").map(col): _*)
      .agg(count(lit(1)).as("n_events"))
}
