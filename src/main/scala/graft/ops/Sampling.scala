package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic corpus splitting/sampling — the train/val/test machinery a
  * training-data pipeline needs. Everything derives from the shared
  * sha256-based hash64 so splits are (a) stable across runs and engines
  * (no RNG, oracle-reproducible), (b) decided row-locally (no shuffle, no
  * coordination — the property that matters at 100 TB), and (c) stratified
  * for free when keyed on a group column instead of the row id (all rows of
  * one group land in one split — leakage-safe splits by document/source).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(TextFns.hash64(key.cast("string")), lit(buckets.toLong))

  /** Assign a split label by cumulative percentage: e.g.
    * Seq("train" -> 90, "val" -> 5, "test" -> 5). Keyed on `key` — pass the
    * row id for row-level splits or a group id (source, url domain, author)
    * for leakage-safe group splits.
    *
    * A null key yields a NULL split (surfaced, not silently routed into the
    * last split): deciding where unkeyed rows belong is the caller's call,
    * and a silent default would skew whichever split it picked. Matches
    * [[hashSample]], which likewise drops null-key rows.
    */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must total 100")
    val bucket = hashBucket(key, 100)
    val label = splits.tail.scanLeft((splits.head._1, splits.head._2)) {
      case ((_, acc), (name, pct)) => (name, acc + pct)
    }.foldRight(lit(null).cast("string")) {
      case ((name, cum), other) => when(bucket < cum, lit(name)).otherwise(other)
    }
    df.withColumn("split", label)
  }

  /** Deterministic p% sample: keep rows whose hash bucket falls below
    * `percent` — the repeatable TABLESAMPLE (same rows every run/engine).
    */
  def hashSample(df: DataFrame, key: Column, percent: Int): DataFrame =
    df.filter(hashBucket(key, 100) < percent)
}
