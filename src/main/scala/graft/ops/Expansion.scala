package graft.ops

import org.apache.spark.sql.SparkSession

/** The expansion-join parallelism rule, in ONE place (the q173 lesson —
  * see PLANS.md "q173 round-9"): AQE's partition coalescing is driven by
  * shuffle INPUT bytes and cannot see join OUTPUT size, so a
  * pair-generation join (near-dup blocks, posting-list self-joins, wedge
  * enumeration, linkage cells) whose input is a few MB but whose output is
  * quadratic gets folded onto 1–2 tasks. Pinning with an EXPLICIT-count
  * repartition on the join key is exempt from coalescing, and giving both
  * sides the same count makes the join co-partitioned (no extra exchange).
  *
  * The ×3 over the session's shuffle partitions buys slack for per-cell
  * output imbalance; the floor keeps small sessions honest. Tune here,
  * not at call sites.
  */
object Expansion {
  def parts(spark: SparkSession): Int =
    math.max(spark.sessionState.conf.numShufflePartitions * 3, 32)

  /** The bounded-cell variant: when the per-key join fan-out is capped BY
    * CONSTRUCTION (e.g. a posting self-join behind a `df <= maxDf` prune —
    * every key's output is at most maxDf², so per-partition imbalance is
    * bounded by the cap, not by data skew), the ×3 slack buys nothing and
    * only multiplies task waves at the floor-dominated small end (q92 at
    * sf0.1: 96-task stages on 2 700-row partitions, 3 waves on 32 cores —
    * measured 2.8 s → 1.3 s moving to the session's own parallelism). The
    * explicit count still pins the exchange against AQE's input-bytes
    * coalescing — that exemption, not the multiplier, is the q173 lesson.
    * Joins whose per-cell output is NOT capped must keep [[parts]]. */
  def boundedCellParts(spark: SparkSession): Int =
    math.max(spark.sessionState.conf.numShufflePartitions, 32)
}
