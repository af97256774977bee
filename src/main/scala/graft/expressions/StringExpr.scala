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

/** Codegen helper for [[UnicodeNorm]] — static forwarder callable from
  * generated Java.
  */
object UnicodeNormUtil {
  import java.text.Normalizer

  private val Marks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** mode: 0=NFC 1=NFKC 2=NFD 3=NFKD 4=strip_accents (NFD, drop combining
    * marks, recompose). ASCII input short-circuits to identity — every form
    * is a no-op on ASCII, and a mostly-ASCII corpus (the 100 TB common case)
    * pays one byte-length check per row instead of a Normalizer pass.
    */
  def norm(s: UTF8String, mode: Int): UTF8String = {
    if (s.numBytes == s.numChars) return s // 1 byte per char == pure ASCII
    val str = s.toString
    val out = mode match {
      case 0 => Normalizer.normalize(str, Normalizer.Form.NFC)
      case 1 => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case 2 => Normalizer.normalize(str, Normalizer.Form.NFD)
      case 3 => Normalizer.normalize(str, Normalizer.Form.NFKD)
      case 4 =>
        val d = Normalizer.normalize(str, Normalizer.Form.NFD)
        Normalizer.normalize(Marks.matcher(d).replaceAll(""), Normalizer.Form.NFC)
      case other => throw new IllegalArgumentException(s"unknown mode $other")
    }
    if (out == str) s else UTF8String.fromString(out)
  }
}

/** Unicode normalization as a native codegen expression — the
  * canonicalization step an exact-dedup pass needs before hashing (composed
  * 'é' and decomposed 'e'+U+0301 are different bytes but the same text), and
  * a primitive Spark lacks as a built-in. `strip_accents` matches DuckDB's
  * utf8proc semantics on decomposable characters, which the oracle gate
  * (q126) verifies against DuckDB's independent implementation.
  */
case class UnicodeNorm(child: Expression, mode: Int) extends UnaryExpression {
  require(mode >= 0 && mode <= 4, s"mode must be 0..4, got $mode")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.norm(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeNormUtil.norm($c, $mode)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  val modes: Map[String, Int] = Map(
    "nfc" -> 0, "nfkc" -> 1, "nfd" -> 2, "nfkd" -> 3, "strip_accents" -> 4)

  def mode(form: String): Int = modes.getOrElse(form.toLowerCase,
    throw new IllegalArgumentException(
      s"unknown normalization form '$form' (expected ${modes.keys.mkString("/")})"))

  def apply(c: Column, form: String): Column =
    Bridge.column(UnicodeNorm(Bridge.expression(c.cast("string")), mode(form)))
}
