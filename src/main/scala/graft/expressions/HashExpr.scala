package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper — static forwarder callable from generated Java. */
object HashUtil {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-256"))

  /** First 60 bits of sha256(s) as a non-negative long — bit-identical to
    * `conv(substring(sha2(s, 256), 1, 15), 16, 10)` (15 hex chars = bytes
    * 0..6 plus the high nibble of byte 7) and to the DuckDB oracle form
    * `CAST('0x' || substr(sha256(s),1,15) AS BIGINT)`.
    */
  def sha256Prefix60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Native Catalyst expression for the engine's portable 64-bit hash
  * (TextFns.hash64). The composed built-in chain
  * sha2 → substring → conv → cast materializes an 8-char-per-byte hex
  * string, a substring copy, and a decimal string per row; this evaluates
  * straight from the digest bytes with a thread-local MessageDigest, and
  * participates in whole-stage codegen via a single static call.
  *
  * Custom-expression tier (b) of the extension policy: a scalar kernel the
  * built-ins can only express with per-row garbage; plan shape unchanged.
  */
case class Sha256Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.sha256Prefix60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.sha256Prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256Prefix60 =
    copy(child = newChild)
}

object Sha256Prefix60 {
  /** Column form; the input is cast to string (the hash is defined over the
    * UTF-8 text, matching sha2's string behavior).
    */
  def apply(c: Column): Column =
    Bridge.column(Sha256Prefix60(Bridge.expression(c.cast("string"))))
}

/** Session extension registering the function for SQL use:
  *   SELECT graft_hash64(text) FROM documents
  * Install with .withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.expressions.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Sha256Prefix60].getName, "graft_hash64"),
      (children: Seq[Expression]) => Sha256Prefix60(children.head)))
  }
}
