package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen helpers for the scaled-integer vector kernels (VectorFns): the
  * composed higher-order forms (zip_with/transform/aggregate) are
  * CodegenFallback — interpreted lambda dispatch per ELEMENT per row —
  * which profiling showed dominates every pairwise embedding operator.
  * These evaluate the whole kernel in one native call and keep the maths
  * bit-identical to the HOF forms and the DuckDB oracle:
  * Σ CAST(floor(a[i]*b[i]*scale) AS BIGINT), IEEE-exact per element.
  *
  * Both accept array<float> and array<double> inputs (float→double is an
  * exact widening), so callers can shuffle the narrow float vectors and
  * widen only inside the kernel.
  */
object VecUtil {

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Exact scaled dot product; null when lengths differ (the zip_with form
    * yields null there too — vectors are expected to be uniform length).
    */
  def dotScaled(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
                scale: Double): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(elem(a, i, aFloat) * elem(b, i, bFloat) * scale).toLong
      i += 1
    }
    acc
  }

  /** Exact scaled squared norm. */
  def norm2Scaled(a: ArrayData, aFloat: Boolean, scale: Double): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = elem(a, i, aFloat)
      acc += math.floor(x * x * scale).toLong
      i += 1
    }
    acc
  }

  /** Random-hyperplane signature: bit b = sign of Σ floor(coefs(b)(i) *
    * v(i) * scale). `coefs` is the tiny (planes × dims) matrix computed
    * ONCE on the driver — the composed form re-derived each coefficient
    * from a sha256 per row × plane × dim.
    */
  def planeSig(v: ArrayData, vFloat: Boolean, coefs: Array[Array[Long]],
               scale: Double): Long = {
    val dims = v.numElements()
    var sig = 0L
    var b = 0
    while (b < coefs.length) {
      val row = coefs(b)
      var acc = 0L
      var i = 0
      val n = math.min(dims, row.length)
      while (i < n) {
        acc += math.floor(row(i).toDouble * elem(v, i, vFloat) * scale).toLong
        i += 1
      }
      if (acc >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

private[expressions] trait VecArrayInput { self: Expression =>
  protected def arrayIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
}

/** Σ floor(a[i]*b[i]*scale) as a single codegen'd call — the native form of
  * VectorFns.dotScaled's aggregate(zip_with(...)) chain.
  */
case class DotScaled(left: Expression, right: Expression, scale: Double)
  extends BinaryExpression with VecArrayInput {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // length-mismatch yields null
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_scaled"

  private lazy val lFloat = arrayIsFloat(left.dataType)
  private lazy val rFloat = arrayIsFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dotScaled(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      lFloat, rFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object r = graft.expressions.VecUtil.dotScaled($a, $b, $lFloat, $rFloat, $scale);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) r; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotScaled =
    copy(left = newLeft, right = newRight)
}

object DotScaled {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotScaled(Bridge.expression(a), Bridge.expression(b),
      graft.functions.VectorFns.Scale))
}

/** Σ floor(v[i]²·scale) — native form of VectorFns.norm2Scaled. */
case class Norm2Scaled(child: Expression, scale: Double)
  extends UnaryExpression with VecArrayInput {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_norm2_scaled"

  private lazy val isFloat = arrayIsFloat(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VecUtil.norm2Scaled(a.asInstanceOf[ArrayData], isFloat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VecUtil.norm2Scaled($c, $isFloat, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Norm2Scaled =
    copy(child = newChild)
}

object Norm2Scaled {
  def apply(c: Column): Column =
    Bridge.column(Norm2Scaled(Bridge.expression(c),
      graft.functions.VectorFns.Scale))
}

/** Random-hyperplane LSH signature with a driver-precomputed coefficient
  * matrix (planes × dims, derived from the shared sha256 hash family so the
  * DuckDB oracle reproduces every bit — see Similarity.planeSignature).
  */
case class PlaneSig(child: Expression, coefs: Array[Array[Long]], scale: Double)
  extends UnaryExpression with VecArrayInput {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_plane_sig"

  private lazy val isFloat = arrayIsFloat(child.dataType)

  override protected def nullSafeEval(a: Any): Any =
    VecUtil.planeSig(a.asInstanceOf[ArrayData], isFloat, coefs, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planeCoefs", coefs, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VecUtil.planeSig($c, $isFloat, $ref, $scale)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSig =
    copy(child = newChild)
}

object PlaneSig {
  def apply(c: Column, coefs: Array[Array[Long]], scale: Double): Column =
    Bridge.column(PlaneSig(Bridge.expression(c), coefs, scale))
}
