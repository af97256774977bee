package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper — static forwarder callable from generated Java. */
object StrUtil {

  /** All distinct strings reachable from `s` by deleting at most `k`
    * characters (includes `s` itself). The symmetric-delete (SymSpell)
    * candidate signature: lev(a, b) <= k implies the two neighborhoods
    * share at least one element, so an equi-join on the variants is a
    * COMPLETE blocking for an edit-distance-<=k pair search — no
    * length-band or prefix assumption (which degenerate on corpora with a
    * long shared prefix, e.g. TPC-H 'Customer#...' names).
    *
    * Char-based (like Spark's and DuckDB's levenshtein on BMP text);
    * neighborhood size is O(len^k), so k is capped at 2 by the callers.
    */
  def deletionNeighborhood(s: UTF8String, k: Int): GenericArrayData = {
    val str = s.toString
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    if (k >= 1) {
      var i = 0
      while (i < str.length) {
        val d1 = str.substring(0, i) + str.substring(i + 1)
        seen.add(d1)
        if (k >= 2) {
          var j = 0
          while (j < d1.length) {
            seen.add(d1.substring(0, j) + d1.substring(j + 1))
            j += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var n = 0
    while (it.hasNext) { out(n) = UTF8String.fromString(it.next()); n += 1 }
    new GenericArrayData(out)
  }
}

/** array<string> of all <=k-deletion variants of the input — the SymSpell
  * candidate-generation signature for complete edit-distance blocking
  * (see StrUtil.deletionNeighborhood).
  */
case class DeletionNeighborhood(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 2, s"deletion neighborhood is O(len^k); k=$k unsupported")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_deletion_neighborhood"

  override protected def nullSafeEval(input: Any): Any =
    StrUtil.deletionNeighborhood(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StrUtil.deletionNeighborhood($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): DeletionNeighborhood =
    copy(child = newChild)
}

object DeletionNeighborhood {
  def apply(c: Column, k: Int): Column =
    Bridge.column(DeletionNeighborhood(Bridge.expression(c.cast("string")), k))
}
