package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 — typed `Aggregator[IN, BUF, OUT]` extension surface: a bounded
  * top-k heap, the classic sketch the built-ins lack (a global
  * orderBy().limit() sorts everything; per-group row_number shuffles and
  * sorts every row — this keeps only k candidates per partition and merges
  * heaps, the map-side-combine shape that survives 100 TB groups).
  *
  * Ordering: max-first by (score, tiebreak) — the tiebreak makes results
  * deterministic for equal scores.
  */
object TopK {

  type Entry = (Double, Long) // (score, tiebreak id)

  final case class TopKAgg(k: Int) extends Aggregator[Entry, mutable.PriorityQueue[Entry], Seq[Entry]] {
    // min-heap of the current best k: dequeue() evicts the WORST kept entry
    // = lowest score, and among equal scores the LARGEST id (natural Long
    // ordering here), because the keep-contract ranks (score desc, id asc) —
    // a reversed tiebreak would evict the smallest id and diverge from the
    // window-function oracle when ties straddle the k boundary
    private def ord: Ordering[Entry] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    override def zero: mutable.PriorityQueue[Entry] =
      mutable.PriorityQueue.empty[Entry](ord)

    override def reduce(b: mutable.PriorityQueue[Entry], a: Entry): mutable.PriorityQueue[Entry] = {
      b.enqueue(a)
      while (b.size > k) b.dequeue() // drop current worst
      b
    }

    override def merge(b1: mutable.PriorityQueue[Entry], b2: mutable.PriorityQueue[Entry]): mutable.PriorityQueue[Entry] = {
      b2.foreach(e => reduce(b1, e))
      b1
    }

    /** Best-first: (score desc, id asc). */
    override def finish(b: mutable.PriorityQueue[Entry]): Seq[Entry] =
      b.toSeq.sortBy(e => (-e._1, e._2))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Entry]] =
      Encoders.kryo[mutable.PriorityQueue[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }
}
