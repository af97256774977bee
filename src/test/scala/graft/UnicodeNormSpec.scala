package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.Sampling

/** The Unicode canonicalization expression (UnicodeNorm) and the
  * Efraimidis–Spirakis weighted sample — engine-local properties; cross-
  * engine parity is oracle-gated (q126/q127).
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "café"          // é as one code point
  private val decomposed = "café"       // e + combining acute

  test("NFC unifies composed and decomposed forms; NFD splits them") {
    val df = Seq((composed, decomposed)).toDF("c", "d")
    val row = df.select(
      TextFns.unicodeNorm(col("c"), "nfc").as("nc"),
      TextFns.unicodeNorm(col("d"), "nfc").as("nd"),
      TextFns.unicodeNorm(col("c"), "nfd").as("dc"),
      length(col("c")).as("lc"), length(col("d")).as("ld")).head()
    assert(row.getString(0) == row.getString(1), "NFC must unify the forms")
    assert(row.getString(2) == decomposed, "NFD decomposes the composed form")
    assert(row.getInt(3) == 4 && row.getInt(4) == 5,
      "fixture must really differ in code-point length")
  }

  test("strip_accents drops marks from both forms; ASCII is untouched") {
    val df = Seq((composed, decomposed, "plain ascii!")).toDF("c", "d", "a")
    val row = df.select(
      TextFns.stripAccents(col("c")),
      TextFns.stripAccents(col("d")),
      TextFns.stripAccents(col("a"))).head()
    assert(row.getString(0) == "cafe" && row.getString(1) == "cafe")
    assert(row.getString(2) == "plain ascii!")
  }

  test("normalization is idempotent and null-propagating") {
    val df = Seq(Some(decomposed), None).toDF("s")
    val out = df.select(
      TextFns.unicodeNorm(TextFns.unicodeNorm(col("s"), "nfc"), "nfc").as("twice"),
      TextFns.unicodeNorm(col("s"), "nfc").as("once"))
      .collect()
    assert(out(0).getString(0) == out(0).getString(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("NFKC folds compatibility forms (ligature fi, fullwidth digits)") {
    val df = Seq("ﬁle １２").toDF("s") // ﬁle １２
    assert(df.select(TextFns.unicodeNorm(col("s"), "nfkc")).head().getString(0)
      == "file 12")
  }

  test("SQL registration: graft_unicode_norm with and without a form") {
    val got = spark.sql(
      s"SELECT graft_unicode_norm('café'), " +
        s"graft_unicode_norm('café', 'strip_accents')").head()
    assert(got.getString(0) == composed)
    assert(got.getString(1) == "cafe")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_unicode_norm('x', 'bogus')").head()
    }
    assert(err.getMessage.contains("bogus"))
  }

  test("canonicalize collapses case, accents, and whitespace runs") {
    val df = Seq("  Café  du   MONDE \t").toDF("s")
    assert(df.select(TextFns.canonicalize(col("s"))).head().getString(0)
      == "cafe du monde")
  }

  test("interpreted eval agrees with codegen") {
    val e = expressions.UnicodeNorm(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed),
        org.apache.spark.sql.types.StringType), 0)
    assert(e.eval(null).toString == composed)
  }

  test("weightedTopK: deterministic, k rows, weight-monotone inclusion") {
    val df = (0 until 200).map(i => (i.toLong, if (i < 100) 1000 else 1))
      .toDF("id", "w")
    val a = Sampling.weightedTopK(df, col("id"), col("w"), 20)
      .select("id").as[Long].collect().toSeq.sorted
    val b = Sampling.weightedTopK(df, col("id"), col("w"), 20)
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b, "same data, same draw — no RNG anywhere")
    assert(a.size == 20)
    // ids 0..99 carry 1000x the weight of 100..199: the sample must be
    // dominated by the heavy stratum (binomially, ~20 of 20)
    assert(a.count(_ < 100) >= 18, s"heavy-weight rows must dominate: $a")
    // schema passes through without the internal sort key
    assert(Sampling.weightedTopK(df, col("id"), col("w"), 5).columns.toSeq
      == Seq("id", "w"))
  }
}
