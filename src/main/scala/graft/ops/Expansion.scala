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
}
