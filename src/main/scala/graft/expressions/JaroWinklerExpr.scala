package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper — static forwarder callable from generated Java. */
object JaroWinklerUtil {

  /** Jaro–Winkler similarity in [0, 1] — the textbook definition with the
    * standard parameters (prefix weight 0.1, prefix cap 4, Winkler boost
    * applied only when the Jaro similarity exceeds 0.7), matching DuckDB's
    * `jaro_winkler_similarity` (verified bit-for-bit by the q173 oracle
    * gate and the fuzz spec).
    *
    * BYTE-based over the UTF-8 encoding — DuckDB's semantics (probed:
    * 'café'/'cafe' scores as 13-vs-12 units, i.e. é counts as two), and
    * the zero-allocation one for UTF8String. On ASCII text bytes ≡ chars;
    * non-ASCII pairs compare their UTF-8 byte sequences, which the fuzz
    * spec pins against DuckDB. The double arithmetic is a FIXED tree over
    * exact small integers — m/l1 + m/l2 + (m−t)/m, one division each — so
    * engines agree bitwise: there is no accumulated rounding to drift.
    */
  def similarity(aStr: UTF8String, bStr: UTF8String): Double = {
    val la = aStr.numBytes
    val lb = bStr.numBytes
    // DuckDB pins BOTH empty-side cases to 0 (including '' vs '' — probed
    // empirically; some libraries return 1 there). Matching the oracle.
    if (la == 0 || lb == 0) return 0.0
    // ≤64-byte sides (the record-linkage hot case) run the long-bitmask
    // match-flag path: no allocation at all
    if (la <= 64 && lb <= 64) return similaritySmall(aStr, bStr, la, lb)
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && aStr.getByte(i) == bStr.getByte(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes of a vs matched bytes of b, in order
    var t2 = 0 // 2 * transpositions
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (aStr.getByte(i) != bStr.getByte(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && aStr.getByte(l) == bStr.getByte(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  // per-thread reusable byte→positions mask table (2 KiB) — zero
  // allocation per call; entries touched by a call are cleared before it
  // returns
  private val posMaskTL: ThreadLocal[Array[Long]] =
    new ThreadLocal[Array[Long]] {
      override def initialValue(): Array[Long] = new Array[Long](256)
    }

  /** Bitmask specialization of [[similarity]] for ≤64-byte sides —
    * IDENTICAL matching semantics (each a-byte takes the SMALLEST
    * unmatched in-window b-position: lowest set bit of the candidate
    * mask ≡ the sequential scan's first hit) and the same
    * double-arithmetic tree, so results are bit-equal to the generic
    * path (pinned by the fuzz spec running both). The per-byte window
    * scan becomes three bit-ops + a trailing-zero count via a
    * 256-entry byte→positions mask built in O(lb).
    */
  private def similaritySmall(a: UTF8String, b: UTF8String,
                              la: Int, lb: Int): Double = {
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val pos = posMaskTL.get()
    var j = 0
    while (j < lb) {
      pos(b.getByte(j) & 0xff) |= 1L << j
      j += 1
    }
    var aM = 0L
    var bM = 0L
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      // bits lo..hi inclusive (hi <= 63 by the ASCII-small precondition)
      val wmask = ((~0L) << lo) &
        (if (hi == 63) ~0L else (1L << (hi + 1)) - 1L)
      val cand = pos(a.getByte(i) & 0xff) & wmask & ~bM
      if (cand != 0L) {
        val jj = java.lang.Long.numberOfTrailingZeros(cand)
        aM |= 1L << i; bM |= 1L << jj; m += 1
      }
      i += 1
    }
    j = 0
    while (j < lb) {
      pos(b.getByte(j) & 0xff) = 0L
      j += 1
    }
    if (m == 0) return 0.0
    var t2 = 0
    var k = 0
    i = 0
    while (i < la) {
      if (((aM >>> i) & 1L) != 0L) {
        while (((bM >>> k) & 1L) == 0L) k += 1
        if (a.getByte(i) != b.getByte(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.getByte(l) == b.getByte(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

/** `jaro_winkler(a, b)` as a native codegen expression — the scalar
  * similarity primitive Spark lacks (DuckDB ships it built-in; Spark has
  * only levenshtein). Used by the blocked fuzzy-pair join (Fuzzy
  * .jaroWinklerPairs), where it runs inside whole-stage codegen on the
  * blocked candidate pairs only.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerUtil.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(
      Bridge.expression(a.cast("string")), Bridge.expression(b.cast("string"))))
}
