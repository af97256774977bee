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
}
