package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate anomaly detection — the pipeline-observability op that
  * watches an ingest feed: per (key, day) event counts scored against the
  * key's own trailing window (z-score vs the previous `window` days,
  * current day excluded).
  *
  * Scoring covers BOTH failure shapes of a baseline:
  *  - varying baseline → classic z-score, flagged past `threshold`;
  *  - perfectly FLAT baseline (variance 0 — heartbeat feeds) → any
  *    deviation at all is flagged (z_score stays null: it is ±∞
  *    morally, and a fake large number would poison downstream stats).
  *
  * A key that emits NOTHING on a day produces no row here — score rows
  * you have. To surface outages ("went quiet") as zero-count days,
  * densify first with [[densifyDays]] and the silent day arrives as
  * n_events = 0, which the flat-baseline rule then flags.
  *
  * Engine-portable by construction: the trailing moments are SUMs of
  * integer counts (exact, order-independent) over a RANGE frame; the only
  * floating-point work is a fixed tree of divisions/multiplications and
  * one sqrt on those exact sums — bit-identical across engines, so the
  * z-scores themselves hash-match an oracle (no epsilon compare needed).
  *
  * Plan shape: two exchanges, deliberately — the day aggregate shuffles
  * the raw feed WITH map-side combine (to |keys × days| rows), then the
  * window re-shuffles that tiny aggregate to key partitioning.
  * Pre-partitioning the raw feed by key would fuse them into one
  * exchange but ship every raw event uncombined — strictly worse at
  * 100 TB.
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
    Seq("trailing_days", "z_score", "is_anomaly").foreach(c =>
      require(!counts.columns.contains(c),
        s"output column '$c' already exists on the input"))
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
    val scored = n >= minPeriods
    val z = when(scored && variance > 0, (c - mean) / sqrt(variance))
    counts
      .withColumn("trailing_days", count(lit(1)).over(w))
      .withColumn("z_score", z)
      .withColumn("is_anomaly",
        // outer coalesce: an unscorable row (null sums -> null flat test)
        // must read FALSE, not null — `false OR null` is null in SQL
        coalesce(
          coalesce(abs(col("z_score")) > threshold, lit(false)) ||
            // flat baseline: ANY deviation is anomalous (z is morally ±∞)
            (scored && variance === 0.0 && c =!= mean),
          lit(false)))
  }

  /** Per-(key, day) event counts from a raw feed; `day` is the epoch-day
    * of `tsMillis` via TRUNCATING division (cast after exact double
    * division — matches SQL `//` integer-division semantics, which
    * truncate toward zero; a floor here would disagree with the oracle
    * on pre-1970 timestamps).
    */
  def dailyCounts(events: DataFrame, keyCols: Seq[String],
                  tsMillis: Column): DataFrame =
    events
      .withColumn("day", (tsMillis / lit(86400000L)).cast("long"))
      .groupBy((keyCols :+ "day").map(col): _*)
      .agg(count(lit(1)).as("n_events"))

  /** Densify a (key, day) count table so silent days exist as
    * n_events = 0 rows: each key is extended from its own first observed
    * day through the CORPUS-WIDE last observed day (a dead key stays
    * visible to the end of the feed — extending only to the key's own
    * last day would hide exactly the outage being hunted). Compose:
    * `rateAnomalies(densifyDays(counts, keys, "day"), keys, "day")`.
    */
  def densifyDays(counts: DataFrame, keyCols: Seq[String],
                  dayCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val feedEnd = broadcast(counts.agg(max(col(dayCol)).as("__feed_end")))
    val spans = counts.groupBy(kc: _*)
      .agg(min(col(dayCol)).as("__first"))
      .crossJoin(feedEnd)
    val allDays = spans
      .select(kc :+ explode(sequence(col("__first"), col("__feed_end")))
        .as(dayCol): _*)
    allDays.join(counts, keyCols :+ dayCol, "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
  }
}
