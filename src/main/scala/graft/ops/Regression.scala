package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise closed-form statistics — per-key ordinary least squares,
  * the "trend per entity" primitive behind drift detection, demand
  * forecasting features, and per-source quality trajectories.
  *
  * Scale design: ONE map-side-combined aggregate carries the five
  * sufficient statistics (n, Σx, Σy, Σxy, Σx²); the closed-form solve is
  * a row-local projection over the group-sized result. No second pass, no
  * window, no collect. All math is exact BIGINT with integer `div` —
  * bit-portable across engines and partitionings (a float Σxy would not
  * be: parallel summation order varies). Overflow headroom: safe while
  * n·Σx² < 2⁶³/scale — keep `x` rebased near zero (epoch-days from a
  * recent origin, not raw millis); for groups beyond ~10⁶ points, center
  * x per group first (shift-invariant slope) or drop to DECIMAL(38,0).
  */
object Regression {

  /** Per-`key` OLS fit of y = slope·x + intercept over integral columns.
    * Returns (key, n, slope_ppm, intercept_ppm) with both coefficients in
    * exact integer parts-per-`scale` (floor division, mirroring SQL `//`).
    * Groups with fewer than 2 points or zero x-variance are dropped —
    * a vertical line has no slope.
    */
  def fitLinePerKey(df: DataFrame, key: Column, x: Column, y: Column,
                    scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, "scale must be >= 1")
    df.select(key.as("key"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("n") >= 2 && col("n") * col("sxx") - col("sx") * col("sx") > 0)
      .select(col("key"), col("n"),
        expr(s"${scale}L * (n * sxy - sx * sy) div (n * sxx - sx * sx)")
          .as("slope_ppm"),
        expr(s"(${scale}L * sy - (${scale}L * (n * sxy - sx * sy) " +
          s"div (n * sxx - sx * sx)) * sx) div n").as("intercept_ppm"))
  }

  /** Theil–Sen robust trend per key: the lower median of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i), x_i < x_j — a 29% breakdown point
    * where [[fitLinePerKey]]'s OLS slope is dragged arbitrarily far by one
    * corrupted day (the MAD-vs-stddev argument of q133, applied to trend).
    *
    * The slope is reported as the exact integer FRACTION (slope_num,
    * slope_den) — one floor division would reintroduce the
    * floor-vs-truncate drift on negative slopes that q170 documents, so
    * rounding is the caller's choice. Median selection orders by the IEEE
    * double num/den (identical correct rounding in both engines) with the
    * (num, den) pair as the deterministic tie-break; equal-valued
    * fractions in different representations order by representation, so
    * both engines pick the same ROW.
    *
    * Cost: the pair self-join is O(points²) per key — per-key series
    * here are bounded timelines (daily aggregates: ~365 points/year →
    * ~66k pairs), the q150 sessionization-bound argument; the median rank
    * window rides the same key exchange.
    */
  def theilSenPerKey(df: DataFrame, key: Column, x: Column,
                     y: Column): DataFrame = {
    val b = df.select(key.as("key"), x.cast("long").as("_x"),
      y.cast("long").as("_y"))
    val pairs = b.toDF("key", "_x", "_y").as("a")
      .join(b.toDF("key", "_bx", "_by").as("b"),
        col("a.key") === col("b.key") && col("_x") < col("_bx"))
      .select(col("a.key").as("key"),
        (col("_by") - col("_y")).as("slope_num"),
        (col("_bx") - col("_x")).as("slope_den"))
    val grp = org.apache.spark.sql.expressions.Window.partitionBy("key")
    pairs
      .withColumn("n_pairs", count(lit(1)).over(grp))
      .withColumn("_rn", row_number().over(grp.orderBy(
        col("slope_num").cast("double") / col("slope_den"),
        col("slope_num"), col("slope_den"))))
      .filter(col("_rn") === expr("(n_pairs + 1) div 2"))
      .select(col("key"), col("n_pairs"), col("slope_num"),
        col("slope_den"))
  }
}
