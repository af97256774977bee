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

  /** All four 60-bit parts of sha256(s) from ONE digest — part j covers hex
    * chars 15j+1..15j+15 (1-based), bit-identical to the DuckDB oracle form
    * `CAST('0x' || substr(sha256(s), 15*j+1, 15) AS BIGINT)` for j in 0..3.
    * The composed built-in equivalent runs one sha2 hex materialization plus
    * four substring+conv string-decimal decodes per row.
    */
  def sha256Parts(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val md = digests.get()
    md.reset()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      partsOf(md.digest(s.getBytes)))
  }

  private def partsOf(d: Array[Byte]): Array[Long] = {
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      var v = 0L
      var i = 15 * j
      val end = i + 15
      while (i < end) {
        val nib =
          if ((i & 1) == 0) (d(i >> 1) & 0xf0) >>> 4
          else d(i >> 1) & 0x0f
        v = (v << 4) | nib
        i += 1
      }
      out(j) = v
      j += 1
    }
    out
  }

  /** Byte ranges [from, until) of each word-`n`-gram shingle of `text` when
    * split on single spaces (0x20 — safe byte-wise in UTF-8): because the
    * separator is exactly one space, the joined shingle string IS the
    * contiguous substring from the start of word i to the end of word i+n-1,
    * so each digest runs straight over a slice of the original bytes with no
    * per-shingle string construction. Matches
    * `concat_ws(' ', w[i..i+n-1])` over `split(text, ' ')` bit-for-bit,
    * including empty words from consecutive spaces.
    */
  private def shingleRanges(bytes: Array[Byte], n: Int): (Array[Int], Int) = {
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) words += 1; i += 1 }
    val numShingles = if (words < n) 0 else words - n + 1
    if (numShingles == 0) return (Array.emptyIntArray, 0)
    // starts(k) = byte offset of word k; word k ends at starts(k+1)-1 (space)
    val starts = new Array[Int](words + 1)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(words) = bytes.length + 1 // sentinel: end-of-word w = starts(w+1)-1
    (starts, numShingles)
  }

  /** hash64 (60-bit sha256 prefix) of every word-n-gram shingle — the native
    * fused form of explode(wordShingles(text)) → hash64(sh): the composed
    * chain pays a non-codegen higher-order transform building one string per
    * shingle (3 element_at + concat_ws each), which profiling showed
    * dominates the dedup queries' cost, not the digest itself.
    */
  def shingleHashes(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val (starts, numShingles) = shingleRanges(bytes, n)
    val out = new Array[Long](numShingles)
    val md = digests.get()
    var s = 0
    while (s < numShingles) {
      val from = starts(s)
      val until = starts(s + n) - 1
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      out(s) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** [[shingleHashes]] with row-local term-frequency aggregation fused in:
    * map(term -> tf) instead of one array slot per occurrence. Feeds
    * posting-list builds (sparseCosinePairs) where the downstream
    * relation is keyed (doc, term) — counting inside the row removes the
    * (doc, term) groupBy SHUFFLE from the plan entirely (the map explodes
    * straight into posting rows already unique per doc).
    */
  def shingleTermCounts(text: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.util.MapData = {
    val arr = shingleHashes(text, n)
    val m = new java.util.LinkedHashMap[java.lang.Long, Long]()
    var i = 0
    val len = arr.numElements()
    while (i < len) {
      val t = arr.getLong(i)
      val prev = m.get(t)
      m.put(t, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val keys = new Array[Long](m.size)
    val vals = new Array[Long](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
  }

  /** SimHash signature in one pass over the text bytes: for every word
    * (single-space split, like shingleRanges), hash64 votes ±1 on each of
    * `bits` signature bits (term frequency = vote weight); bit b is set
    * when its vote sum is positive. Bit-identical to the composed form
    * (explode words → 32 sum(when) columns → pack) and the DuckDB oracle,
    * without the word-row explode or the 32-accumulator aggregation —
    * the signature becomes a narrow per-row map.
    */
  def simHashBits(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](bits)
    val md = digests.get()
    var wordStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, wordStart, i - wordStart)
        val d = md.digest()
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        val wh = (v << 4) | ((d(7) & 0xf0L) >>> 4)
        var b = 0
        while (b < bits) {
          if (((wh >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        wordStart = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** All four 60-bit sha256 parts of every word-n-gram shingle (inner array
    * element 0 == [[shingleHashes]]' value) — feeds MinHash, where the k
    * hash functions mix the four parts.
    */
  def shingleParts(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = text.getBytes
    val (starts, numShingles) = shingleRanges(bytes, n)
    val out = new Array[Any](numShingles)
    val md = digests.get()
    var s = 0
    while (s < numShingles) {
      val from = starts(s)
      val until = starts(s + n) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(s) = new org.apache.spark.sql.catalyst.util.GenericArrayData(partsOf(md.digest()))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

  // null in -> null out, never null otherwise: lets the optimizer rewrite
  // isnotnull(graft_hash64(x)) to isnotnull(x) instead of running the digest
  // twice per row (once in the join-key null filter, once in the project).
  override def nullIntolerant: Boolean = true
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

/** Four 60-bit sha256 parts as array<long> from a single digest — the hash
  * family feeding MinHash (graft.ops.Dedup.minHashSignatures). One native
  * call replaces sha2 → 64-char hex → 4 × (substring + conv base-16 decimal
  * decode) per shingle, which dominated the MinHash stage's profile.
  */
case class Sha256Parts(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hash64_parts"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.sha256Parts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.sha256Parts($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha256Parts =
    copy(child = newChild)
}

object Sha256Parts {
  def apply(c: Column): Column =
    Bridge.column(Sha256Parts(Bridge.expression(c.cast("string"))))
}

/** array<long> of hash64(shingle) for every word-`n`-gram of the text —
  * fuses explode(wordShingles) + hash64 into one codegen'd pass over the
  * text bytes (see HashUtil.shingleHashes for why the composed form is
  * slow: the higher-order transform is interpreted, one string per shingle).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.shingleHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(c.cast("string")), n))
}

/** map<long,long> of hash64(shingle) -> term frequency for every
  * word-`n`-gram — [[ShingleHashes]] with the per-row tf count fused in
  * (HashUtil.shingleTermCounts). `explode` of the map yields (term, tf)
  * posting rows that are unique per document BY CONSTRUCTION, so the
  * posting build needs no (doc, term) aggregation exchange.
  */
case class ShingleTermCounts(child: Expression, n: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(LongType, LongType,
      valueContainsNull = false)
  override def prettyName: String = "graft_shingle_term_counts"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.shingleTermCounts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashUtil.shingleTermCounts($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleTermCounts =
    copy(child = newChild)
}

object ShingleTermCounts {
  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleTermCounts(Bridge.expression(c.cast("string")), n))
}

/** array<array<long>> — the four 60-bit sha256 parts of every word-n-gram
  * shingle; inner element 0 equals the [[ShingleHashes]] value.
  */
case class ShingleParts(child: Expression, n: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
      containsNull = false)
  override def prettyName: String = "graft_shingle_parts"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.shingleParts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.shingleParts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleParts =
    copy(child = newChild)
}

object ShingleParts {
  def apply(c: Column, n: Int): Column =
    Bridge.column(ShingleParts(Bridge.expression(c.cast("string")), n))
}

/** Whole-document SimHash signature as one codegen'd call (see
  * HashUtil.simHashBits) — replaces explode(words) + a `bits`-column
  * vote aggregation with a narrow per-row expression.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 60, s"simhash bits must be 1..60, got $bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.simHashBits(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtil.simHashBits($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  def apply(c: Column, bits: Int): Column =
    Bridge.column(SimHashBits(Bridge.expression(c.cast("string")), bits))
}

/** Session extension registering the engine's native functions for SQL use:
  *   SELECT graft_hash64(text), graft_shingle_hashes(text, 3) FROM documents
  * Install with .withExtensions(new GraftExtensions) or
  * spark.sql.extensions=graft.expressions.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Non-column parameters (shingle n, deletion k) arrive as literal
    * arguments in SQL; they parameterize codegen, so they must fold to an
    * int at plan time.
    */
  private def litInt(e: Expression, fn: String): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal integer parameter, got $other")
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    inject("graft_hash64", c => Sha256Prefix60(c.head))
    inject("graft_hash64_parts", c => Sha256Parts(c.head))
    inject("graft_shingle_hashes", c =>
      ShingleHashes(c.head,
        if (c.length > 1) litInt(c(1), "graft_shingle_hashes") else 3))
    inject("graft_shingle_parts", c =>
      ShingleParts(c.head,
        if (c.length > 1) litInt(c(1), "graft_shingle_parts") else 3))
    inject("graft_deletion_neighborhood", c =>
      DeletionNeighborhood(c.head,
        if (c.length > 1) litInt(c(1), "graft_deletion_neighborhood") else 2))
    inject("graft_dot_scaled", c =>
      DotScaled(c(0), c(1), graft.functions.VectorFns.Scale))
    inject("graft_sum128", c =>
      Sum128(org.apache.spark.sql.catalyst.expressions.Cast(c.head,
        org.apache.spark.sql.types.LongType)))
    inject("graft_norm2_scaled", c =>
      Norm2Scaled(c.head, graft.functions.VectorFns.Scale))
    inject("graft_unicode_norm", c =>
      UnicodeNorm(c.head, UnicodeNorm.mode(
        if (c.length > 1) litString(c(1), "graft_unicode_norm") else "nfc")))
    inject("graft_interleave_bits", c =>
      InterleaveBits(
        org.apache.spark.sql.catalyst.expressions.Cast(c(0),
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(c(1),
          org.apache.spark.sql.types.LongType),
        if (c.length > 2) litInt(c(2), "graft_interleave_bits") else 16))
  }

  private def litString(e: Expression, fn: String): String =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal string parameter, got $other")
    }
}
