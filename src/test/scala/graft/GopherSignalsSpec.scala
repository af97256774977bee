package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.{GopherSignals, TopGramCov}

/** The native single-pass GopherSignals / TopGramCov expressions must be
  * bit-identical to the composed built-in chains they replaced (the q258
  * r14 form) — those chains are what the DuckDB oracle mirrors.
  */
class GopherSignalsSpec extends SparkSpec {
  import spark.implicits._

  // the composed reference forms, verbatim from the r14 q258 registration
  private def fiveWordLines(ws: Column): Column = {
    val k = ceil(size(ws).cast("double") / 5.0).cast("int")
    transform(sequence(lit(0), k - 1),
      i => array_join(slice(ws, i * 5 + 1, lit(5)), " "))
  }

  private def topGramCovComposed(ws: Column, n: Int): Column = {
    val grams = array_sort(transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => array_join(slice(ws, i, lit(n)), " ")))
    val fold = aggregate(grams,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"),
            run * length(x).cast("long")).as("best"))
      },
      acc => acc.getField("best"))
    when(size(ws) >= n, fold).otherwise(lit(0L))
  }

  private val fixedTexts = Seq(
    "", "a", "the", "a a a a a a a a", "one two three four five six",
    "- bullet line starts here and more words follow after it",
    "ends with dots and then some more words to spare ...",
    "x y x y x y x y x y x y", "sym!@# 99 mixed CASE Words",
    "ü unicode ¢ text ∆ with € wide ✓ chars",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13",
    "  double  spaces  make  empty  words  ",
    ("repeat me " * 30).trim)

  private def genTexts: Seq[String] = {
    val word = Gen.oneOf(Gen.oneOf("the", "and", "of", "to", "a", "-",
      "...", "x", "yy", "zzz"), Gen.alphaNumStr.map(_.take(6)))
    val gen = Gen.listOfN(300,
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word))
        .map(_.mkString(" ")))
    gen.apply(Gen.Parameters.default, Seed(1515L)).get
  }

  test("native GopherSignals equals the composed builtin chain field by field") {
    val ws = split($"text", " ")
    val stops = array(Seq("the", "and", "of", "to", "a").map(lit): _*)
    val lines = fiveWordLines(ws)
    val df = (fixedTexts ++ genTexts).toDF("text")
      .select($"text", GopherSignals($"text").as("_gs"))
    val bad = df.select(
      ($"_gs".getField("n_words") === size(ws).cast("long")).as("a"),
      ($"_gs".getField("n_chars") === length($"text").cast("long")).as("b"),
      ($"_gs".getField("n_sym") ===
        length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("long")).as("c"),
      ($"_gs".getField("n_bullet") ===
        size(filter(lines, l => l.startsWith("- "))).cast("long")).as("d"),
      ($"_gs".getField("n_ellipsis") ===
        size(filter(lines, l => l.endsWith("..."))).cast("long")).as("e"),
      ($"_gs".getField("n_lines") === size(lines).cast("long")).as("f"),
      ($"_gs".getField("n_alpha") ===
        size(filter(ws, x => x.rlike("[a-zA-Z]"))).cast("long")).as("g"),
      ($"_gs".getField("has_stop") ===
        (size(array_intersect(ws, stops)) > 0)).as("h"),
      ($"_gs".getField("lines") === lines).as("i"))
      .filter(!($"a" && $"b" && $"c" && $"d" && $"e" && $"f" && $"g" &&
        $"h" && $"i")).count()
    assert(bad == 0)
  }

  test("native TopGramCov equals the composed sort+fold for n=2..4") {
    val ws = split($"text", " ")
    val df = (fixedTexts ++ genTexts).toDF("text")
    val bad = df.select(
      (TopGramCov($"text", 2) === topGramCovComposed(ws, 2)).as("a"),
      (GopherSignals($"text").getField("cov2") ===
        topGramCovComposed(ws, 2)).as("a2"),
      (TopGramCov($"text", 3) === topGramCovComposed(ws, 3)).as("b"),
      (GopherSignals($"text").getField("cov3") ===
        topGramCovComposed(ws, 3)).as("b2"),
      (TopGramCov($"text", 4) === topGramCovComposed(ws, 4)).as("c"),
      (GopherSignals($"text").getField("cov4") ===
        topGramCovComposed(ws, 4)).as("c2"))
      .filter(!($"a" && $"a2" && $"b" && $"b2" && $"c" && $"c2")).count()
    assert(bad == 0)
  }

  test("DupGramCov hand-checked: overlap merges, disjoint sums, n above " +
    "the repeat length covers zero") {
    import graft.expressions.DupGramCov
    // "a b c d e" repeated twice with a separator word:
    // text = "a b c d e x a b c d e" (21 chars)
    // dup 5-grams: "a b c d e" at word pos 0 and 6 -> two disjoint
    // char spans [0,9) and [12,21) -> 9 + 9 = 18
    // dup 6-grams: none repeat -> 0
    val t1 = "a b c d e x a b c d e"
    // overlapping occurrences: "a a a a a a a" -> dup 5-grams at pos
    // 0,1,2 (all equal "a a a a a"), spans [0,9),[2,11),[4,13) merge to
    // [0,13) = 13 chars
    val t2 = "a a a a a a a"
    val r = Seq(t1, t2).toDF("text")
      .select($"text", DupGramCov($"text", 5).as("d5"),
        DupGramCov($"text", 6).as("d6"))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2)))
      .toMap
    assert(r(t1) == ((18L, 0L)))
    assert(r(t2) == ((13L, 13L))) // 6-grams at pos 0,1 -> [0,11),[2,13)
  }

  test("TopGramCov hand-checked values") {
    // "x y x y x y": 2-grams = x_y ×3, y_x ×2 → best cov = 3×3 = 9
    val r = Seq("x y x y x y").toDF("text")
      .select(TopGramCov($"text", 2).as("c2"),
        TopGramCov($"text", 3).as("c3"),
        TopGramCov($"text", 7).as("c7"))
      .head()
    assert(r.getLong(0) == 9L) // "x y" appears 3×, 3 chars each
    assert(r.getLong(1) == 10L) // "x y x" ×2, 5 chars
    assert(r.getLong(2) == 0L) // fewer than 7 words
  }
}
