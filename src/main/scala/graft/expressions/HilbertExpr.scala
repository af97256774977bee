package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen helper — static forwarder callable from generated Java. */
object HilbertUtil {

  /** Hilbert curve index of a pre-quantized (x, y) cell on a 2^bits ×
    * 2^bits grid — the standard iterative xy→d transform (rotate/reflect
    * each quadrant as the scale halves). Pure bit-level integer function
    * of its inputs: engine-portable, oracle-reproducible (the SQL oracle
    * unrolls the same `bits` steps).
    *
    * vs Morton ([[ZOrderUtil.interleave]]): every unit step along the
    * Hilbert curve is a unit step in the grid, so consecutive curve
    * ranges are CONTIGUOUS blocks — min/max footers per file tighten
    * further than Z-order's quadrant jumps (why table services offer
    * both; Z is cheaper to compute, H clusters better).
    */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the quadrant so the sub-curve orientation is canonical
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert index of two pre-quantized coordinates — [[InterleaveBits]]'s
  * better-locality sibling for multi-dimensional data layout. Inputs must
  * be LongType in [0, 2^bits); the caller owns quantization (same contract
  * as the Morton kernel).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertUtil.index(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.HilbertUtil.index($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  def apply(x: Column, y: Column, bits: Int): Column =
    Bridge.column(HilbertIndex(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
}
