package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's skew-join
  * splitting doesn't apply (it only rewrites sort-merge joins; a hot key
  * inside a shuffled hash join or an ObjectHashAggregate still lands on one
  * task).
  *
  * [[saltedJoin]] replicates the small side `saltBuckets` times and spreads
  * the big side's hot keys uniformly with a deterministic row salt, so one
  * logical key occupies `saltBuckets` tasks. Row counts and values are
  * unchanged — only the physical key space is widened.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, salted.
    *
    * The salt is derived from the big side's whole row (xxhash64), so it is
    * deterministic under retries and needs no extra column from the caller.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full-outer would emit each unmatched SMALL-side row once per
    // replica — salting only preserves inner/left/semi/anti semantics
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin cannot preserve '$joinType' semantics (small side is replicated)")
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltBuckets)).cast("int"))
    val smallExploded = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigSalted.join(smallExploded, keys :+ "_salt", joinType).drop("_salt")
  }
}
