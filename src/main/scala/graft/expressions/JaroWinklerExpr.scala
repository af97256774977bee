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
    * Char-based on UTF-16 units (like Spark's and DuckDB's levenshtein on
    * BMP text). The double arithmetic is a FIXED tree over exact small
    * integers — m/l1 + m/l2 + (m−t)/m, one division each — so engines
    * agree bitwise: there is no accumulated rounding to drift.
    */
  def similarity(aStr: UTF8String, bStr: UTF8String): Double = {
    val a = aStr.toString
    val b = bStr.toString
    val la = a.length
    val lb = b.length
    // DuckDB pins BOTH empty-side cases to 0 (including '' vs '' — probed
    // empirically; some libraries return 1 there). Matching the oracle.
    if (la == 0 || lb == 0) return 0.0
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
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t2 = 0 // 2 * transpositions
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val lMax = math.min(4, math.min(la, lb))
    while (l < lMax && a.charAt(l) == b.charAt(l)) l += 1
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
