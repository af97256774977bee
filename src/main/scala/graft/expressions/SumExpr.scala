package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, BinaryExpression, EvalMode, Expression, If, IsNull, Literal, Or, ShiftRight, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseNot, BitwiseOr}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, LongType}
import org.apache.spark.sql.types.Decimal

/** Codegen helper for [[Sum128]] — static forwarder callable from generated
  * Java.
  */
object SumUtil {
  /** The signed 128-bit integer (hi·2⁶⁴ + unsigned lo) as DECIMAL(38,0).
    * Runs once per GROUP at aggregate evaluation — never per row.
    */
  def int128ToDecimal(hi: Long, lo: Long): Decimal = {
    val biLo =
      if (lo >= 0) BigInteger.valueOf(lo)
      else BigInteger.valueOf(lo & Long.MaxValue).setBit(63)
    val v = BigInteger.valueOf(hi).shiftLeft(64).add(biLo)
    Decimal(new java.math.BigDecimal(v), 38, 0)
  }
}

/** (hi, lo) two-long pair → DECIMAL(38,0); the finishing step of
  * [[Sum128]]. Kept as its own expression so the aggregate's evaluate
  * expression stays declarative.
  */
case class Int128ToDecimal(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(hi: Any, lo: Any): Any =
    SumUtil.int128ToDecimal(hi.asInstanceOf[Long], lo.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (hi, lo) => s"graft.expressions.SumUtil.int128ToDecimal($hi, $lo)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int128ToDecimal =
    copy(left = newLeft, right = newRight)
}

/** Exact 128-bit integer SUM over a LONG column, returned as DECIMAL(38,0).
  *
  * Spark's built-in `sum(x.cast(DECIMAL(38,0)))` is correct but pays a
  * BigDecimal allocation and scaled add PER ROW — on a wide exact-moments
  * aggregate (e.g. the 36-column Pearson matrix in `Profile.corrPairs`)
  * that dominates the whole scan. This aggregate keeps the running sum as
  * two codegen-resident longs (hi, lo) with an explicit carry:
  *
  *   lo' = lo + x                            (wrapping 64-bit add)
  *   carry = ((lo & x) | ((lo | x) & ~lo')) >>> 63
  *   hi' = hi + (x >> 63) + carry            (x sign-extended to 128 bits)
  *
  * so the per-row work is five bitwise ops and three wrapping adds, all
  * inside whole-stage codegen's mutable aggregate buffer — no object ever
  * allocates until the once-per-group DECIMAL conversion. Merge applies the
  * same carry add to partial (hi, lo) pairs, so map-side partial
  * aggregation combines exactly.
  *
  * Semantics match `sum(CAST(x AS DECIMAL(38,0)))`: nulls are skipped, an
  * empty/all-null group yields NULL. Range: |sum| < 2⁶³·2⁶⁴ ≈ 1.7·10³⁸
  * before the 128-bit accumulator itself wraps — beyond any physical row
  * count times int64 addend (the DECIMAL(38,0) ceiling of 10³⁸−1 is the
  * marginally tighter bound, identical to the built-in decimal sum's).
  * The wrapping adds are deliberate two's-complement arithmetic and are
  * built with LEGACY eval mode so ANSI mode cannot turn a carry into an
  * overflow error.
  */
case class Sum128(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)

  private val hi = AttributeReference("hi", LongType, nullable = false)()
  private val lo = AttributeReference("lo", LongType, nullable = false)()
  private val nonEmpty =
    AttributeReference("nonEmpty", BooleanType, nullable = false)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, nonEmpty)

  override val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  private def wrapAdd(l: Expression, r: Expression): Expression =
    Add(l, r, EvalMode.LEGACY)

  /** (hiL, loL) += (hiR, loR) as one signed 128-bit add: wrapping low add,
    * unsigned carry out of bit 63, carry into the high word.
    */
  private def add128(hiL: Expression, loL: Expression,
                     hiR: Expression, loR: Expression): Seq[Expression] = {
    val newLo = wrapAdd(loL, loR)
    val carry = ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(loL, loR),
        BitwiseAnd(BitwiseOr(loL, loR), BitwiseNot(newLo))),
      Literal(63))
    val newHi = wrapAdd(wrapAdd(hiL, hiR), carry)
    Seq(newHi, newLo)
  }

  override lazy val updateExpressions: Seq[Expression] = {
    // null-as-zero instead of If(IsNull, keep, add): adding 0 is the
    // 128-bit add's identity, so the result is the same null-skipping sum
    // but the child expression is evaluated once and the add tree appears
    // once — an If form duplicated both per buffer slot, which at ~36
    // aggregates per operator (corrPairs) tripled the generated update
    // method. nonEmpty still tracks real non-null input for the empty→NULL
    // contract.
    val x = child
    val xs = org.apache.spark.sql.catalyst.expressions.Coalesce(
      Seq(x, Literal(0L)))
    val Seq(newHi, newLo) =
      add128(hi, lo, ShiftRight(xs, Literal(63)), xs)
    Seq(newHi, newLo,
      Or(nonEmpty, org.apache.spark.sql.catalyst.expressions.Not(IsNull(x))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val Seq(newHi, newLo) = add128(hi.left, lo.left, hi.right, lo.right)
    Seq(newHi, newLo, Or(nonEmpty.left, nonEmpty.right))
  }

  override lazy val evaluateExpression: Expression =
    If(nonEmpty, Int128ToDecimal(hi, lo),
      Literal(null, DecimalType(38, 0)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Sum128 =
    copy(child = newChildren.head)
}

object Sum128 {
  /** DataFrame form: exact 128-bit sum of a LONG column as DECIMAL(38,0). */
  def apply(c: Column): Column =
    Bridge.column(Sum128(Bridge.expression(c)).toAggregateExpression())
}
