package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison — the audit half of table versioning: given two
  * keyed versions of a relation, classify every key and name the columns
  * that moved. (The ledger keeps history by merge; this answers "what
  * CHANGED between two published states" — schema drift reviews, upstream
  * re-delivery audits, regression triage on curated corpora.)
  *
  * Scale shape: ONE full-outer shuffle join on the key; all column
  * comparison is row-local null-safe equality after the join, inside
  * whole-stage codegen. No collect, no per-column rescans — adding a
  * compared column adds a projection expression, not a pass.
  */
object Diff {

  /** Classify every key across two versions.
    *
    * Output: keyCols*, `status` ('added' | 'removed' | 'changed' |
    * 'unchanged'), `changed_cols` (comma-joined compareCols that differ,
    * in caller order; '' unless status = 'changed'). Null-safe: a column
    * moving null→value or value→null counts as changed; two nulls match.
    * Keys must be non-null and unique per version (the usual
    * published-snapshot contract) — duplicate keys would cross-multiply
    * in the join, and a null key never equi-matches, so presence is
    * detected through the key's own nullness after the outer join.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val old = v1.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols.map("k1_" + _) ++ compareCols.map("old_" + _): _*)
    val neu = v2.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols.map("k2_" + _) ++ compareCols.map("new_" + _): _*)
    val joinCond = keyCols.map(k => col("k1_" + k) === col("k2_" + k))
      .reduce(_ && _)
    val j = old.join(neu, joinCond, "full_outer")
    val inV1 = col("k1_" + keyCols.head).isNotNull
    val inV2 = col("k2_" + keyCols.head).isNotNull
    val allEqual = compareCols
      .map(c => col("old_" + c) <=> col("new_" + c)).reduce(_ && _)
    val status = when(!inV1, lit("added"))
      .when(!inV2, lit("removed"))
      .when(allEqual, lit("unchanged"))
      .otherwise(lit("changed"))
    // concat_ws skips nulls, so each unchanged column contributes nothing
    val changedCols = when(inV1 && inV2,
      concat_ws(",", compareCols.map(c =>
        when(!(col("old_" + c) <=> col("new_" + c)), lit(c))): _*))
      .otherwise(lit(""))
    val keys = keyCols.map(k =>
      coalesce(col("k1_" + k), col("k2_" + k)).as(k))
    j.select(keys ++ Seq(status.as("status"),
      changedCols.as("changed_cols")): _*)
  }
}
