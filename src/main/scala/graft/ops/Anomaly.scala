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

  /** Gap-fill + last-observation-carried-forward over a (key, day) count
    * grid — the resampling step a time-series feature pipeline runs before
    * any window model: silent days materialize as `n_events = 0` with
    * `filled = true`, and `locf_n` carries the key's last OBSERVED count
    * across the gap (null before the key's first observation — a LOCF
    * that invents a pre-history would fabricate signal).
    *
    * Exact by construction: days and counts are integers; no floats.
    *
    * Shape at 100 TB: the grid explode is |keys| × |span days| rows
    * (bounded by calendar span, not event volume); the LOCF window is
    * key-partitioned and day-ordered — parallel across keys, no global
    * sort. Raw events were already collapsed to per-day counts upstream
    * (map-side combined), so nothing here rescans the feed.
    */
  def gapFillLocf(counts: DataFrame, keyCols: Seq[String],
                  dayCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    densifyDays(counts.withColumn("__obs", lit(true)), keyCols, dayCol)
      .withColumn("filled", col("__obs").isNull)
      .withColumn("locf_n",
        last(when(!col("filled"), col("n_events")), ignoreNulls = true)
          .over(w))
      .drop("__obs")
  }

  /** Per-key lag-k autocorrelation SUFFICIENT STATISTICS over a day-count
    * series — emitted as exact integers (num, den) rather than a rounded
    * ratio, because r_k's numerator is signed and floor-vs-truncate
    * integer division disagrees between engines on negatives; the caller
    * (or the oracle) divides.
    *
    * With n = series length and S = Σx, the n-scaled residual
    * r_t = n·x_t − S is an exact integer, and
    *   num_k = Σ_{t≤n−k} r_t·r_{t+k},   den = Σ r_t²
    * give r_k = num_k/den exactly (the n² scale cancels).
    *
    * Expects a DENSIFIED grid ([[densifyDays]]) — autocorrelation over a
    * series with silently missing rows is a different (wrong) statistic.
    *
    * Overflow bound: |r_t| ≤ n·max(x), so den ≤ n³·max(x)² — int64-safe
    * through ~10⁸ events/key/day on month-long spans; past that, cast the
    * two products to DECIMAL(38,0) (q152's discipline).
    *
    * Shape at 100 TB: one key-partitioned window pass (lead per lag) over
    * the already-tiny |keys × days| grid, then a map-side-combined
    * aggregate. Nothing touches raw events.
    */
  def autocorrStats(counts: DataFrame, keyCols: Seq[String], dayCol: String,
                    nCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val kc = keyCols.map(col)
    val wAll = Window.partitionBy(kc: _*)
    val wOrd = wAll.orderBy(col(dayCol))
    val base = counts
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col(nCol)).over(wAll))
      .withColumn("__r", col("__n") * col(nCol).cast("long") - col("__s"))
    val perLag = lags.map { k =>
      base
        .withColumn("__rk", lead(col("__r"), k).over(wOrd))
        .groupBy(kc: _*)
        .agg(
          lit(k).as("lag"),
          count(lit(1)).as("n_days"),
          sum(col("__r") * col("__rk")).as("num"),
          sum(col("__r") * col("__r")).as("den"))
    }
    perLag.reduce(_.unionByName(_))
      .select((kc :+ col("lag") :+ col("n_days") :+
        coalesce(col("num"), lit(0L)).as("num") :+ col("den")): _*)
  }

  /** Per-key one-sided CUSUM level-shift scan over a day-count series —
    * "did this feed's rate shift up, and when?" — using the rank-one
    * identity  cusum⁺_t = P_t − min(0, min_{u≤t} P_u)  where
    * P_t = Σ_{u≤t} (n·x_u − S) is the n-scaled running deviation from the
    * series mean. That turns the textbook recurrence
    * C_t = max(0, C_{t−1} + dev_t) — not expressible as a window frame —
    * into two plain running windows. All integers, exact.
    *
    * Output per key: (n_days, max_cusum, peak_day) with max_cusum in the
    * n-scaled unit (divide by n for event units) and peak_day the FIRST
    * day attaining the max (deterministic under ties).
    *
    * Shape at 100 TB: two key-partitioned ordered windows plus one
    * aggregate over the |keys × days| grid — parallel across keys.
    */
  def cusumShift(counts: DataFrame, keyCols: Seq[String], dayCol: String,
                 nCol: String): DataFrame = {
    val kc = keyCols.map(col)
    val wAll = Window.partitionBy(kc: _*)
    val wRun = wAll.orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scanned = counts
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col(nCol)).over(wAll))
      .withColumn("__p",
        sum(col("__n") * col(nCol).cast("long") - col("__s")).over(wRun))
      .withColumn("__m", least(lit(0L), min(col("__p")).over(wRun)))
      .withColumn("__c", col("__p") - col("__m"))
      .withColumn("__cmax", max(col("__c")).over(wAll))
    scanned.groupBy(kc: _*)
      .agg(
        max(col("__n")).as("n_days"),
        max(col("__c")).as("max_cusum"),
        min(when(col("__c") === col("__cmax"), col(dayCol)))
          .as("peak_day"))
  }
}
