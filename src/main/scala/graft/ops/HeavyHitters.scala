package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.10 — frequent-item detection via the two-pass mergeable-summary
  * pattern, the shape that survives 100 TB where a naive
  * `groupBy(value).count` shuffles every row of a high-cardinality column:
  *
  *  1. a Misra–Gries summary (k counters) per partition, merged as a typed
  *     `Aggregator` — the only thing that moves is k-sized state, and the
  *     driver receives ONE k-sized map (a model, like k-means centroids);
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

  final case class MisraGriesAgg(k: Int)
      extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be positive, got $k")

    override def zero: mutable.Map[String, Long] = mutable.Map.empty

    override def reduce(b: mutable.Map[String, Long],
                        a: String): mutable.Map[String, Long] = {
      b.get(a) match {
        case Some(c) => b(a) = c + 1
        case None if b.size < k => b(a) = 1L
        case None =>
          // decrement-all: the classic MG step — amortized O(1) per evicted
          // count, worst-case O(k) on this row (keys snapshotted: mutating
          // a map mid-iteration is undefined)
          b.keys.toArray.foreach { key =>
            val c = b(key) - 1
            if (c <= 0) b.remove(key) else b(key) = c
          }
      }
      b
    }

    override def merge(b1: mutable.Map[String, Long],
                       b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b2.foreach { case (v, c) => b1(v) = b1.getOrElse(v, 0L) + c }
      if (b1.size > k) {
        val cut = b1.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        b1.keys.toArray.foreach { key =>
          val c = b1(key) - cut
          if (c <= 0) b1.remove(key) else b1(key) = c
        }
      }
      b1
    }

    override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

    override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Exact values occurring more than n/k times in `valueCol`, as
    * (value, n_occurrences) — MG candidates verified by an exact count.
    * Two passes over the data, k-bounded driver state, no raw-data shuffle
    * (pass 1 moves k counters per partition; pass 2 aggregates only rows
    * matching ≤k candidate values).
    */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCol.cast("string").as("v"))
    val summary: Map[String, Long] = vals.as[String]
      .select(MisraGriesAgg(k).toColumn).head()
    val candidates = summary.keys.toSeq
    if (candidates.isEmpty) {
      return vals.limit(0).select(col("v").as("value"),
        lit(0L).as("n_occurrences"))
    }
    val n = broadcast(vals.agg(count(lit(1)).as("__n")))
    vals.filter(col("v").isin(candidates: _*))
      .groupBy(col("v").as("value"))
      .agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(n)
      .filter(col("n_occurrences") * k > col("__n"))
      .select(col("value"), col("n_occurrences"))
  }
}
