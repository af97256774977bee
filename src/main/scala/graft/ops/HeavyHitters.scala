package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.10 — frequent-item detection via the two-pass mergeable-summary
  * pattern, the shape that survives 100 TB where a naive
  * `groupBy(value).count` shuffles every row of a high-cardinality column:
  *
  *  1. a Misra–Gries summary (k counters + the exact row total) per
  *     partition, merged as a typed `Aggregator` — the only thing that
  *     moves is k-sized state, and the driver receives ONE k-sized map
  *     (a model, like k-means centroids);
  *  2. an exact count of just the ≤k surviving candidates (a `isin` filter
  *     the scan can push down + one tiny aggregate).
  *
  * MG guarantee: any value with frequency > n/(k+1) is present in the
  * summary (no false negatives at the `> n/k` threshold used here), and
  * the exact second pass removes all false positives — so the OUTPUT IS
  * EXACT, reproducible, and oracle-checkable, while the raw-data shuffle
  * of the naive plan is gone. Cf. Misra & Gries 1982; the merge rule
  * (add counts, subtract the (k+1)-th largest, drop non-positive) is the
  * standard mergeable-summaries form (Agarwal et al., PODS'12).
  */
object HeavyHitters {

  /** MG state: the bounded counters plus the exact number of values seen —
    * carrying n in the buffer keeps [[heavyHitters]] at two data passes
    * (a separate count would be a third full scan).
    */
  final case class MGBuf(var n: Long, counters: mutable.Map[String, Long])

  final case class MisraGriesAgg(k: Int)
      extends Aggregator[String, MGBuf, (Long, Map[String, Long])] {
    require(k >= 1, s"k must be positive, got $k")

    override def zero: MGBuf = MGBuf(0L, mutable.Map.empty)

    override def reduce(b: MGBuf, a: String): MGBuf = {
      b.n += 1
      val m = b.counters
      m.get(a) match {
        case Some(c) => m(a) = c + 1
        case None if m.size < k => m(a) = 1L
        case None =>
          // decrement-all: the classic MG step — amortized O(1) per evicted
          // count, worst-case O(k) on this row (keys snapshotted: mutating
          // a map mid-iteration is undefined)
          m.keys.toArray.foreach { key =>
            val c = m(key) - 1
            if (c <= 0) m.remove(key) else m(key) = c
          }
      }
      b
    }

    override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      b1.n += b2.n
      val m = b1.counters
      b2.counters.foreach { case (v, c) => m(v) = m.getOrElse(v, 0L) + c }
      if (m.size > k) {
        val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.keys.toArray.foreach { key =>
          val c = m(key) - cut
          if (c <= 0) m.remove(key) else m(key) = c
        }
      }
      b1
    }

    override def finish(b: MGBuf): (Long, Map[String, Long]) =
      (b.n, b.counters.toMap)

    override def bufferEncoder: Encoder[MGBuf] = Encoders.kryo[MGBuf]
    override def outputEncoder: Encoder[(Long, Map[String, Long])] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Map[String, Long])]()
  }

  /** Exact values occurring more than n/k times in `valueCol`, as
    * (value, n_occurrences) — MG candidates verified by an exact count.
    * Two passes over the data, k-bounded driver state, no raw-data shuffle
    * (pass 1 moves k counters per partition; pass 2 aggregates only rows
    * matching ≤k candidate values, behind a pushable `isin`).
    *
    * NULL values are EXCLUDED — from the candidates, the counts, and the
    * row total n (`IN (...)` would silently drop null rows from the exact
    * pass anyway; dropping them from n too keeps the `> n/k` bar
    * consistent rather than letting unseen nulls raise it).
    */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCol.cast("string").as("v")).na.drop(Seq("v"))
    val (n, summary) = vals.as[String]
      .select(MisraGriesAgg(k).toColumn).head()
    val candidates = summary.keys.toSeq
    if (candidates.isEmpty) {
      return vals.limit(0).select(col("v").as("value"),
        lit(0L).as("n_occurrences"))
    }
    vals.filter(col("v").isin(candidates: _*))
      .groupBy(col("v").as("value"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * k > lit(n))
  }

  /** Count-min sketch point queries with an exact audit — the OTHER
    * classic frequency summary beside Misra–Gries (Cormode & Muthukrishnan
    * 2005): `depth` hash rows of `width` counters, each value incrementing
    * one counter per row, point estimate = min over rows. One-sided error
    * by construction (estimate ≥ exact, always — collisions only ADD), and
    * the sketch relation is mergeable by plain per-cell summation, which
    * is why it survives any partitioning.
    *
    * Where [[heavyHitters]] answers "which values are frequent", CMS
    * answers "how frequent is THIS value" for values chosen after the
    * scan — the audit reports, per probe, the exact count next to the
    * estimate so the (depth, width) sizing is certified by measurement
    * (the q190/q204/q211 sketch-audit posture; overcount ≤ ⌈n/width⌉
    * per row in expectation, and the gate shows the realized values).
    *
    * Hashing is the shared seeded sha256 family (engine-portable — the
    * oracle builds the identical sketch). NULLs are excluded, as in
    * [[heavyHitters]].
    *
    * Shape at 100 TB: ONE scan exploded ×depth, map-side combined to a
    * ≤ depth·width-cell sketch (broadcast everywhere after); the exact
    * pass aggregates only rows matching the ≤|probes| values behind a
    * pushable isin. No raw-data shuffle, no driver state beyond the
    * sketch model.
    *
    * Output: (value, exact_n, est_n, overcount), one row per probe.
    */
  def cmsAudit(df: DataFrame, valueCol: Column, probes: Seq[String],
               depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be 1..16: $depth")
    require(width >= 1, s"width must be >= 1: $width")
    require(probes.nonEmpty && probes.distinct.size == probes.size,
      s"probes must be non-empty and distinct: $probes")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.TextFns
    val vals = df.select(valueCol.cast("string").as("_v")).na.drop(Seq("_v"))
    def bucketed(src: DataFrame, v: String) = src
      .select(col(v), explode(sequence(lit(0L), lit(depth - 1L))).as("_j"))
      .select(col(v), col("_j"),
        pmod(TextFns.seededHash64(col("_j"), col(v)), lit(width.toLong))
          .as("_b"))
    val sketch = bucketed(vals, "_v")
      .groupBy("_j", "_b").agg(count(lit(1)).as("_c"))
    val est = bucketed(probes.toDF("value"), "value")
      .join(broadcast(sketch), Seq("_j", "_b"), "left")
      .groupBy("value")
      .agg(min(coalesce(col("_c"), lit(0L))).as("est_n"))
    val exact = vals.filter(col("_v").isin(probes: _*))
      .groupBy(col("_v").as("value")).agg(count(lit(1)).as("exact_n"))
    est.join(exact, Seq("value"), "left")
      .select(col("value"),
        coalesce(col("exact_n"), lit(0L)).as("exact_n"), col("est_n"))
      .withColumn("overcount", col("est_n") - col("exact_n"))
  }
}
