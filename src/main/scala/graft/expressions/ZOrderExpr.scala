package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen helper — static forwarder callable from generated Java. */
object ZOrderUtil {

  /** Interleave the low `bits` bits of x (even positions) and y (odd):
    * the Morton / Z-order curve value. Inputs must already be quantized to
    * [0, 2^bits); the caller owns quantization so the curve stays a pure
    * bit-level function (engine-portable, oracle-reproducible).
    */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Morton interleave of two pre-quantized coordinates — the kernel of
  * Z-order data layout (multi-dimensional clustering for file skipping:
  * sort by the curve value and BOTH dimensions' min/max footers tighten,
  * where a single-column sort tightens only its own). Spark has no built-in;
  * Delta/Iceberg ship it as a table service — here it's a plain codegen
  * expression usable with any writer.
  */
/** Inputs must be LongType — the Column apply and the SQL builder in
  * GraftExtensions both insert the cast (AbstractDataType is private[sql]
  * in Spark 4, so ImplicitCastInputTypes is not open to libraries).
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_interleave_bits"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrderUtil.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ZOrderUtil.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def apply(x: Column, y: Column, bits: Int): Column =
    Bridge.column(InterleaveBits(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")), bits))
}
