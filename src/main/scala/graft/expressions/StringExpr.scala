package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** Codegen helper for [[TopGramCov]] — static forwarder callable from
  * generated Java.
  */
object TopGramCovUtil {

  /** Max over the text's distinct space-delimited word n-grams of
    * occurrences × gram character length — the characters the heaviest
    * repeated n-gram covers (Gopher's top-n-gram char-fraction numerator,
    * Rae et al. '21 Table A1). Count ties resolve by the larger covered-
    * char product, so the value is deterministic where "the most frequent
    * n-gram" alone is not. Texts with < n words cover 0 chars.
    *
    * Splitting matches `split(text, ' ', -1)` (literal-space regex,
    * trailing empties kept); lengths are code points, matching Spark's
    * and DuckDB's `length` on the joined gram string (words + n−1
    * separator spaces).
    */
  def topGramCov(s: UTF8String, n: Int): Long =
    topGramCovWords(s.toString.split(" ", -1), n)

  def topGramCovWords(words: Array[String], n: Int): Long = {
    if (words.length < n) return 0L
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      counts.merge(sb.toString, 1L, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val g = e.getKey
      val cov = e.getValue * g.codePointCount(0, g.length).toLong
      if (cov > best) best = cov
    }
    best
  }
}

/** Native top-n-gram char cover (see [[TopGramCovUtil.topGramCov]]):
  * row-local, zero shuffles, one HashMap pass per doc — replaces the
  * interpreted transform+array_sort+aggregate fold chain, which measured
  * ~1.2 ms/doc (87 s serial at sf0.1 before the projection fix, still
  * multi-second after) vs ~µs here. The q126/q132 native-expression
  * precedent applied to the Gopher battery's repetition rules.
  */
case class TopGramCov(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_top_gram_cov"

  override protected def nullSafeEval(input: Any): Any =
    TopGramCovUtil.topGramCov(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TopGramCovUtil.topGramCov($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopGramCov =
    copy(child = newChild)
}

object TopGramCov {
  def apply(c: Column, n: Int): Column =
    Bridge.column(TopGramCov(Bridge.expression(c.cast("string")), n))
}

object GramSpansUtil {

  /** All stride-1 word n-grams of `s` with their exact 0-based char
    * offsets, in one linear pass: element i is (gram_i, st_i) where
    * gram_i joins words i..i+n−1 with single spaces and st_i is the
    * running prefix sum Σ_{j<i}(len_j + 1) — len in code points,
    * matching Spark's `length`. The composed form computed each offset
    * with aggregate(slice(_wl, 1, i−1)) — an O(i) interpreted fold per
    * gram, O(words²) long additions per doc (ADVICE r15: the "fixed"
    * quadratic had only changed units, chars → longs); this is the truly
    * linear offset pass. Splitting matches split(text, ' ', -1)
    * (trailing empties kept). Docs shorter than n words yield the empty
    * array.
    */
  def gramSpans(s: UTF8String, n: Int): GenericArrayData = {
    val words = s.toString.split(" ", -1)
    val ng = words.length - (n - 1)
    if (ng <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](ng)
    val sb = new java.lang.StringBuilder()
    var st = 0L
    var i = 0
    while (i < ng) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(sb.toString), st))
      st += words(i).codePointCount(0, words(i).length).toLong + 1L
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native stride-1 gram+offset synthesis (see [[GramSpansUtil.gramSpans]]):
  * row-local, one pass, O(words) offsets — replaces the interpreted
  * transform+aggregate(slice) chain in strideGramSpans whose per-gram
  * offset fold was quadratic in words.
  */
case class GramSpans(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("st",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_gram_spans"

  override protected def nullSafeEval(input: Any): Any =
    GramSpansUtil.gramSpans(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GramSpansUtil.gramSpans($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramSpans =
    copy(child = newChild)
}

object GramSpans {
  def apply(c: Column, n: Int): Column =
    Bridge.column(GramSpans(Bridge.expression(c.cast("string")), n))
}

object MaxMultiplicityUtil {

  /** Max multiplicity of any value in a long array (0 for empty) — the
    * native form of the array_sort + run-length aggregate fold ("longest
    * equal run in the sorted array"), which was CodegenFallback with an
    * interpreted struct accumulator per element. Sorts a primitive copy,
    * one run scan; identical result (elements are non-null 60-bit gram
    * hashes by contract).
    */
  def maxMultiplicity(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    // loud contract check (r16 ADVICE): toLongArray NPEs on a null
    // element in GenericArrayData and silently reads 0 slots in
    // UnsafeArrayData — a violated non-null contract must fail clearly,
    // not corrupt the count
    var j = 0
    while (j < n) {
      if (a.isNullAt(j))
        throw new IllegalArgumentException(
          s"graft_max_multiplicity: null element at index $j — input " +
            "arrays must be non-null (60-bit gram hashes by contract)")
      j += 1
    }
    val xs = a.toLongArray()
    java.util.Arrays.sort(xs)
    var best = 1L
    var run = 1L
    var i = 1
    while (i < n) {
      if (xs(i) == xs(i - 1)) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best
  }
}

/** Native max-gram-multiplicity (see [[MaxMultiplicityUtil]]). */
case class MaxMultiplicity(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_max_multiplicity"

  override protected def nullSafeEval(input: Any): Any =
    MaxMultiplicityUtil.maxMultiplicity(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MaxMultiplicityUtil.maxMultiplicity($c)")

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicity =
    copy(child = newChild)
}

object MaxMultiplicity {
  def apply(c: Column): Column =
    Bridge.column(MaxMultiplicity(Bridge.expression(c)))
}

object LuhnUtil {

  /** Luhn checksum over a digit string — the native form of the
    * sequence + substring fold: sum from the right, doubling alternate
    * digits (−9 on overflow); TRUE iff non-empty and sum % 10 == 0.
    * A non-digit character yields NULL where the ANSI composed fold
    * would THROW on the cast — callers feed regexp-extracted digit
    * runs, so the branch is defensive, never a gate path.
    */
  def luhnValid(s: UTF8String): Any = {
    val str = s.toString
    val n = str.length
    if (n == 0) return false
    var sum = 0L
    var i = 0
    while (i < n) {
      val c = str.charAt(n - 1 - i)
      if (c < '0' || c > '9') return null
      val d = (c - '0').toLong
      sum += (if (i % 2 == 0) d else { val t = d * 2; if (t > 9) t - 9 else t })
      i += 1
    }
    sum % 10 == 0
  }
}

/** Native Luhn validity (see [[LuhnUtil.luhnValid]]). */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true // non-digit input
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_luhn_valid"

  override protected def nullSafeEval(input: Any): Any =
    LuhnUtil.luhnValid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object r = graft.expressions.LuhnUtil.luhnValid($c);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Boolean) r).booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}

object LuhnValid {
  def apply(c: Column): Column =
    Bridge.column(LuhnValid(Bridge.expression(c.cast("string"))))
}

object MergePairUtil {

  /** Greedy left-to-right single-pass merge of one constant (a,b) symbol
    * pair — the BPE pass. State machine identical to the composed
    * aggregate fold it replaces (state = emitted list + one pending
    * symbol; a merged symbol cannot re-merge in the same pass, so 'aaa'
    * under (a,a) → ['aa','a']). The fold was CodegenFallback AND copied
    * the accumulator array per element (array_append) — O(len²) per word;
    * this is one linear pass with no copies.
    */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String,
                ab: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = new java.util.ArrayList[Any](n)
    var pending: UTF8String = null
    var i = 0
    while (i < n) {
      val x = syms.getUTF8String(i)
      if (pending == null) pending = x
      else if (pending.equals(a) && x != null && x.equals(b)) {
        out.add(ab); pending = null
      } else { out.add(pending); pending = x }
      i += 1
    }
    if (pending != null) out.add(pending)
    new GenericArrayData(out.toArray)
  }
}

/** Native BPE merge pass (see [[MergePairUtil.mergePair]]); the merge
  * pair is a training-time constant, baked in as reference objects.
  */
case class MergePair(child: Expression, a: String, b: String)
  extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  @transient private lazy val abU = UTF8String.fromString(a + b)

  override protected def nullSafeEval(input: Any): Any =
    MergePairUtil.mergePair(input.asInstanceOf[ArrayData], aU, bU, abU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mpA", aU, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("mpB", bU, classOf[UTF8String].getName)
    val abRef = ctx.addReferenceObj("mpAB", abU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MergePairUtil.mergePair($c, $aRef, $bRef, $abRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MergePair =
    copy(child = newChild)
}

object MergePair {
  def apply(c: Column, a: String, b: String): Column =
    Bridge.column(MergePair(Bridge.expression(c), a, b))
}

/** Codegen helper for [[GopherSignals]] — static forwarder callable from
  * generated Java.
  */
object GopherSignalsUtil {
  private val STOPS: java.util.Set[String] =
    new java.util.HashSet[String](java.util.Arrays.asList(
      "the", "and", "of", "to", "a"))

  /** All row-local Gopher-battery signals in ONE pass over the text —
    * the q258 gate's per-doc column block. Semantics are pinned to the
    * composed-builtin forms the oracle mirrors:
    *   - n_words  = size(split(text, ' ', -1)) (trailing empties kept)
    *   - n_chars  = length(text) in code points
    *   - n_sym    = code points outside [a-z0-9 ] (lowercase class, as
    *                the oracle's regexp_replace)
    *   - lines    = the shared 5-word line synthesis (ceil(n/5) lines,
    *                tail line short) — returned for the dup-line explode
    *   - n_bullet / n_ellipsis = lines starting '- ' / ending '...'
    *   - n_alpha  = words containing an ASCII letter
    *   - has_stop = any word in {the,and,of,to,a}
    *   - cov2/3/4 = [[TopGramCovUtil.topGramCov]] over the same words
    * The interpreted HOF-chain form of this block measured ~0.4 ms/doc
    * (a 1.9 s single-task stage at sf0.1 — the corpus is one parquet row
    * group, so scan-stage parallelism is 1 and per-doc CPU is the whole
    * wall); this pass is ~µs/doc.
    */
  def signals(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val text = s.toString
    val words = text.split(" ", -1)
    val nWords = words.length.toLong
    val nChars = text.codePointCount(0, text.length).toLong
    var nSym = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') ||
          cp == ' ')) nSym += 1
      i += Character.charCount(cp)
    }
    var nAlpha = 0L
    var hasStop = false
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var j = 0
      var alpha = false
      while (!alpha && j < word.length) {
        val c = word.charAt(j)
        alpha = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
        j += 1
      }
      if (alpha) nAlpha += 1
      if (!hasStop && STOPS.contains(word)) hasStop = true
      w += 1
    }
    val nLines = (words.length + 4) / 5
    val lines = new Array[Any](nLines)
    var nBullet = 0L
    var nEllipsis = 0L
    val sb = new java.lang.StringBuilder()
    var li = 0
    while (li < nLines) {
      sb.setLength(0)
      var k = li * 5
      val end = math.min(k + 5, words.length)
      while (k < end) {
        if (k > li * 5) sb.append(' ')
        sb.append(words(k))
        k += 1
      }
      val line = sb.toString
      if (line.startsWith("- ")) nBullet += 1
      if (line.endsWith("...")) nEllipsis += 1
      lines(li) = UTF8String.fromString(line)
      li += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, nChars, nSym, nBullet, nEllipsis, nLines.toLong,
        nAlpha, hasStop,
        TopGramCovUtil.topGramCovWords(words, 2),
        TopGramCovUtil.topGramCovWords(words, 3),
        TopGramCovUtil.topGramCovWords(words, 4),
        new GenericArrayData(lines)))
  }
}

/** Native single-pass Gopher-battery signal block (see
  * [[GopherSignalsUtil.signals]]): struct of the 11 row-local signals +
  * the synthesized 5-word lines array, computed once per doc. Referenced
  * from its own projection (the repetition/vocabulary materialization
  * discipline), so CollapseProject never inlines it per consumer.
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = GopherSignals.schema
  override def prettyName: String = "graft_gopher_signals"

  override protected def nullSafeEval(input: Any): Any =
    GopherSignalsUtil.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GopherSignalsUtil.signals($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherSignals =
    copy(child = newChild)
}

object GopherSignals {
  import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_bullet", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("has_stop", BooleanType, nullable = false),
    StructField("cov2", LongType, nullable = false),
    StructField("cov3", LongType, nullable = false),
    StructField("cov4", LongType, nullable = false),
    StructField("lines", ArrayType(StringType, containsNull = false),
      nullable = false)))

  def apply(c: Column): Column =
    Bridge.column(GopherSignals(Bridge.expression(c.cast("string"))))
}

/** Codegen helper for [[HtmlUnescape]] — static forwarder callable from
  * generated Java.
  */
object HtmlUnescapeUtil {
  private val NAMED = new java.util.HashMap[String, String]()
  NAMED.put("lt", "<"); NAMED.put("gt", ">"); NAMED.put("quot", "\"")
  NAMED.put("nbsp", " "); NAMED.put("amp", "&")

  /** ONE left-to-right entity-decode pass: the reference's 5 named
    * entities (lt/gt/quot/nbsp/amp — [[TextAnalysis.stripMarkup]]'s
    * documented subset) plus GENERIC numeric character references,
    * `&#NN;` decimal and `&#xNN;`/`&#XNN;` hex. Single-decode is
    * structural, not an ordering convention: the scan continues AFTER
    * each decoded entity and never rescans produced text, so
    * `&amp;lt;` yields the literal text `&lt;` and `&#38;amp;` yields
    * `&amp;` — the chained-regexp form needed "&amp; last" to get the
    * first case right and still got the second wrong (decoding &#38;
    * first manufactures an `&amp;` the later pass re-decodes), which is
    * why the numeric tier forces the one-pass form.
    *
    * Malformed or out-of-range references stay literal text: no
    * terminating `;` within 11 chars, empty digits, non-digits, code
    * points above U+10FFFF or in the surrogate block. (HTML5's lenient
    * recovery decodes some of those; this op pins the strict
    * well-formed subset both engines can express.)
    */
  def unescape(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      var next = i + 1
      if (c != '&') sb.append(c)
      else {
        // longest candidate: &#x10FFFF; — ';' at most 10 chars past '&'
        val lim = math.min(str.length, i + 11)
        var semi = -1
        var j = i + 1
        while (semi < 0 && j < lim) {
          if (str.charAt(j) == ';') semi = j
          j += 1
        }
        if (semi > i + 1) {
          val body = str.substring(i + 1, semi)
          if (body.charAt(0) == '#') {
            val hex = body.length > 1 &&
              (body.charAt(1) == 'x' || body.charAt(1) == 'X')
            val d0 = if (hex) 2 else 1
            var cp = if (body.length > d0) 0L else -1L
            var k = d0
            while (cp >= 0 && k < body.length) {
              val ch = body.charAt(k)
              val v =
                if (ch >= '0' && ch <= '9') ch - '0'
                else if (hex && ch >= 'a' && ch <= 'f') ch - 'a' + 10
                else if (hex && ch >= 'A' && ch <= 'F') ch - 'A' + 10
                else -1
              cp = if (v < 0) -1L else cp * (if (hex) 16 else 10) + v
              if (cp > 0x10FFFFL) cp = -1L
              k += 1
            }
            if (cp >= 0 && !(cp >= 0xD800L && cp <= 0xDFFFL)) {
              sb.appendCodePoint(cp.toInt)
              next = semi + 1
            } else sb.append(c)
          } else {
            val named = NAMED.get(body)
            if (named != null) {
              sb.append(named)
              next = semi + 1
            } else sb.append(c)
          }
        } else sb.append(c)
      }
      i = next
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native one-pass HTML entity decode (see [[HtmlUnescapeUtil.unescape]]):
  * the reference's named-entity subset + generic numeric character
  * references, single-decode by construction. The graft_unicode_norm
  * precedent applied to entity decoding.
  */
case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_unescape"

  override protected def nullSafeEval(input: Any): Any =
    HtmlUnescapeUtil.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HtmlUnescapeUtil.unescape($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlUnescape =
    copy(child = newChild)
}

object HtmlUnescape {
  def apply(c: Column): Column =
    Bridge.column(HtmlUnescape(Bridge.expression(c.cast("string"))))
}

/** Codegen helper for [[DupGramCov]] — static forwarder callable from
  * generated Java.
  */
object DupGramCovUtil {

  /** Characters covered by DUPLICATED word n-grams — the numerator of
    * Gopher's duplicate-n-gram char fraction (Rae et al. '21 Table A1,
    * the n = 5..10 family; [[TopGramCovUtil]] is the top-n-gram 2..4
    * family): every occurrence of an n-gram that appears ≥ 2 times in
    * the doc covers its char span (words + internal separator spaces);
    * spans UNION — overlapping occurrences never double-count. Exact
    * interval merge over starts in ascending order (occurrence spans
    * are sorted by construction). Lengths and offsets are code points,
    * matching both engines' `length`. Texts with < n words cover 0.
    */
  def dupGramCov(s: UTF8String, n: Int): Long = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return 0L
    val lens = new Array[Int](words.length)
    val starts = new Array[Int](words.length)
    var off = 0
    var i = 0
    while (i < words.length) {
      lens(i) = words(i).codePointCount(0, words(i).length)
      starts(i) = off
      off += lens(i) + 1
      i += 1
    }
    val counts = new java.util.HashMap[String, Int]()
    val grams = new Array[String](words.length - n + 1)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      grams(i) = sb.toString
      counts.merge(grams(i), 1, (a, b) => a + b)
      i += 1
    }
    var covered = 0L
    var curEnd = -1 // exclusive end of the open merged interval
    var curStart = -1
    i = 0
    while (i < grams.length) {
      if (counts.get(grams(i)) >= 2) {
        val st = starts(i)
        val en = starts(i + n - 1) + lens(i + n - 1) // exclusive
        if (curStart < 0) { curStart = st; curEnd = en }
        else if (st <= curEnd) { if (en > curEnd) curEnd = en }
        else {
          covered += curEnd - curStart
          curStart = st
          curEnd = en
        }
      }
      i += 1
    }
    if (curStart >= 0) covered += curEnd - curStart
    covered
  }
}

/** Native duplicate-n-gram char cover (see [[DupGramCovUtil.dupGramCov]]):
  * row-local, zero shuffles, one pass + one exact interval merge per doc.
  */
case class DupGramCov(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_dup_gram_cov"

  override protected def nullSafeEval(input: Any): Any =
    DupGramCovUtil.dupGramCov(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DupGramCovUtil.dupGramCov($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DupGramCov =
    copy(child = newChild)
}

object DupGramCov {
  def apply(c: Column, n: Int): Column =
    Bridge.column(DupGramCov(Bridge.expression(c.cast("string")), n))
}
