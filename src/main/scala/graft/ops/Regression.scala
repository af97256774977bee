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
}
