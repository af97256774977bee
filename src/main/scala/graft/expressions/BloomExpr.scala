package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a broadcast Bloom filter — the native
  * replacement for the scalar UDF in the ledger dedup pre-filter
  * (`Stages.ingestDedupBloom`): a UDF boxes the value and breaks the
  * whole-stage-codegen span around the one filter every ingest row passes
  * through.
  *
  * The filter rides a `Broadcast` handle, so the serialized plan stays
  * small (the reference array carries the handle, not the MB-sized bit
  * array) and each executor fetches the filter once. Null input probes to
  * FALSE (a null hash is not a member), matching the UDF it replaces, so
  * the expression is non-nullable and `!graft_bloom_might_contain(h)` keeps
  * null-hash rows on the definitely-new branch.
  *
  * `mightContainBinary` on the UTF8 bytes ≡ `mightContainString` (the
  * sketch's putString hashes the UTF-8 encoding) without materializing a
  * java.lang.String per row.
  */
case class BloomMightContain(child: Expression,
                             bloom: Broadcast[BloomFilter])
  extends UnaryExpression with Predicate {

  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bf: BloomFilter = bloom.value

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bf.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bfClass = classOf[BloomFilter].getName
    // resolve the broadcast ONCE per generated-class instance, not per row
    val bfVar = ctx.addMutableState(bfClass, "graftBloomFilter",
      v => s"$v = ($bfClass) $bcRef.value();")
    val c = child.genCode(ctx)
    ev.copy(code = c.code + code"""
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = $bfVar.mightContainBinary(${c.value}.getBytes());
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c.cast("string")), bloom))
}
