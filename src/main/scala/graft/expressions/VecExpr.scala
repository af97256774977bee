package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

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

  /** Exact Σ (a[i]−b[i])² over two array<long> columns — the native form
    * of aggregate(zip_with(a, b, (x,y)=>(x−y)*(x−y)), 0L, _+_), which is
    * CodegenFallback (interpreted lambda dispatch per element per row) and
    * dominated every per-pair stage of the kmeans/SemDeDup family. HOF
    * parity: null when lengths differ (zip_with pads the shorter side with
    * null, nulling the sum) or when any element is null.
    */
  def sqDistLong(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Nearest cell of a driver-collected codebook by exact BIGINT dist2,
    * ties to the LOWER cluster id — bit-identical to the crossJoin +
    * min(struct(d2, cluster)) form it replaces (clusters must be sorted
    * ascending; strict < keeps the first, i.e. lowest, id on ties).
    * Cells whose centroid length differs from the vector are skipped —
    * the callers' uniform-dimensionality contract makes that unreachable
    * (scaleVec filters to the max width; centroids average those rows).
    * Returns null when no cell matches (empty codebook handled by the
    * caller before constructing the expression).
    */
  def nearestCell(v: ArrayData, clusters: Array[Long],
                  cvecs: Array[Array[Long]]): Any = {
    val n = v.numElements()
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < cvecs.length) {
      val cv = cvecs(c)
      if (cv.length == n) {
        var acc = 0L
        var i = 0
        while (i < n) {
          val d = v.getLong(i) - cv(i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
      }
      c += 1
    }
    if (best < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](clusters(best), bestD))
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

/** Σ (a[i]−b[i])² over array<long> as one codegen'd call — see
  * VecUtil.sqDistLong for the exact HOF-parity contract.
  */
case class SqDistLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // length mismatch / null element
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sqdist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.sqDistLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object r = graft.expressions.VecUtil.sqDistLong($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  def apply(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expression(a), Bridge.expression(b)))
}

/** Argmin over a driver-collected codebook as one codegen'd call per row:
  * struct(cluster, dist2) of the nearest centroid by exact BIGINT dist2,
  * ties to the lower cluster id. Replaces the per-assignment
  * crossJoin(broadcast(cents)) + groupBy(min(struct)) — which materialized
  * n×k rows and paid one exchange per kmeans round — with zero shuffles.
  * The codebook is model-sized (k = ⌈√n⌉ at the gates), the same relation
  * the replaced broadcast shipped.
  */
case class NearestCell(child: Expression, clusters: Array[Long],
                       cvecs: Array[Array[Long]])
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // unreachable-width vector
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist2", LongType, nullable = false)))
  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(a: Any): Any =
    VecUtil.nearestCell(a.asInstanceOf[ArrayData], clusters, cvecs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cl = ctx.addReferenceObj("ncClusters", clusters, "long[]")
    val cv = ctx.addReferenceObj("ncCvecs", cvecs, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |Object r = graft.expressions.VecUtil.nearestCell($a, $cl, $cv);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def apply(c: Column, clusters: Array[Long], cvecs: Array[Array[Long]]): Column =
    Bridge.column(NearestCell(Bridge.expression(c), clusters, cvecs))
}
