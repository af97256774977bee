package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Round-16 optimization kernels must be bit-identical to the composed
  * higher-order-function forms they replaced (which are what the DuckDB
  * oracles mirror). Each test evaluates BOTH forms over generated inputs
  * and asserts zero mismatches.
  */
class NativeKernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def seeded[T](gen: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---- SqDistLong vs aggregate(zip_with) -----------------------------

  test("SqDistLong equals the aggregate(zip_with) fold, incl. mismatched lengths") {
    val vecGen = Gen.choose(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.choose(-1000000L, 1000000L)))
    val pairs = seeded(vecGen.flatMap(a => vecGen.map(b => (a, b))), 300, 7L)
    val df = pairs.toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
    val mism = df.select(
        graft.expressions.SqDistLong(col("a"), col("b")).as("fast"),
        hof.as("spec"))
      .filter(!(col("fast") <=> col("spec"))).count()
    assert(mism == 0)
  }

  // ---- NearestCell vs crossJoin + min(struct) ------------------------

  test("NearestCell argmin equals crossJoin+min(struct), ties to lower cluster") {
    val d = 4
    val vecGen = Gen.listOfN(d, Gen.choose(-50L, 50L))
    val vecs = seeded(vecGen, 120, 11L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    // small coordinate range forces plenty of exact distance ties
    val cents = seeded(vecGen, 10, 23L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val sv = vecs.toDF("id", "svec")
    val cb = cents.toDF("cluster", "cvec")
    val d2 = aggregate(
      zip_with(col("svec"), col("cvec"), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
    val spec = sv.crossJoin(broadcast(cb))
      .withColumn("_d2", d2)
      .groupBy(col("id"))
      .agg(min(struct(col("_d2"), col("cluster"))).as("_m"))
      .select(col("id"), col("_m.cluster").as("cluster"),
        col("_m._d2").as("dist2"))
    val sorted = cents.sortBy(_._1)
    val fast = sv.withColumn("_m", graft.expressions.NearestCell(col("svec"),
        sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray))
      .select(col("id"), col("_m.cluster").as("cluster"),
        col("_m.dist2").as("dist2"))
    assert(fast.join(spec, Seq("id"))
      .filter(fast("cluster") =!= spec("cluster") ||
        fast("dist2") =!= spec("dist2")).count() == 0)
    assert(fast.count() == vecs.size)
  }

  // ---- GramSpans vs the composed transform+aggregate(slice) form ------

  test("GramSpans equals the composed gram+prefix-sum construction") {
    val wordGen = Gen.oneOf(Gen.const(""), Gen.const("a"),
      Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString),
      Gen.const("日本語"),
      // supplementary (astral-plane) char: U+1D11E is 2 UTF-16 code units
      // but ONE code point — pins that GramSpans' offsets count code
      // points exactly like Spark's length() (r16 ADVICE)
      Gen.const("a𝄞b"))
    val docGen = Gen.choose(0, 12).flatMap(k =>
      Gen.listOfN(k, wordGen).map(_.mkString(" ")))
    val docs = (seeded(docGen, 200, 31L) ++ Seq("", "a b c", "aa bb cc dd"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val n = 3
    // the r15 composed form, verbatim
    val ws = split(col("text"), " ")
    val nGrams = greatest(size(ws) - (n - 1), lit(0))
    val spec = df.select(col("doc_id"), ws.as("_ws"),
        transform(ws, w => (length(w) + 1).cast("long")).as("_wl"),
        nGrams.as("_ng"))
      .select(col("doc_id"),
        explode(slice(transform(
          sequence(lit(1), greatest(col("_ng"), lit(1))),
          i => struct(
            array_join(slice(col("_ws"), i, lit(n)), " ").as("g"),
            aggregate(slice(col("_wl"), lit(1), i - 1), lit(0L),
              (a, x) => a + x).as("st"))),
          lit(1), col("_ng"))).as("_gr"))
      .select(col("doc_id"), col("_gr.g").as("g"), col("_gr.st").as("st"))
    val fast = graft.ops.TextAnalysis
      .strideGramSpans(df, "doc_id", "text", n)
      .select(col("doc_id"), col("g"), col("st"))
    assert(fast.exceptAll(spec).count() == 0)
    assert(spec.exceptAll(fast).count() == 0)
  }

  // ---- MergePair vs the aggregate fold --------------------------------

  test("MergePair equals the aggregate fold state machine (incl. 'aaa' no-remerge)") {
    val symGen = Gen.oneOf("a", "b", "c", "ab")
    val arrGen = Gen.choose(0, 8).flatMap(k => Gen.listOfN(k, symGen))
    val rows = (seeded(arrGen, 300, 43L) ++
      Seq(Seq("a", "a", "a"), Seq("a", "b", "a", "b"), Seq.empty[String]))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "syms")
    // the r15 composed fold, verbatim (constants a='a', b='b')
    val a = lit("a"); val b = lit("b")
    val zero = struct(lit(Array.empty[String]).as("out"),
      lit(null).cast("string").as("pending"))
    val spec = aggregate(col("syms"), zero,
      (acc, x) => {
        val out = acc.getField("out"); val p = acc.getField("pending")
        val isMerge = p === a && x === b
        struct(
          when(p.isNull, out)
            .when(isMerge, array_append(out, concat(a, b)))
            .otherwise(array_append(out, p)).as("out"),
          when(p.isNull, x)
            .when(isMerge, lit(null).cast("string"))
            .otherwise(x).as("pending"))
      },
      acc => when(acc.getField("pending").isNull, acc.getField("out"))
        .otherwise(array_append(acc.getField("out"),
          acc.getField("pending"))))
    val mism = df.select(
        graft.expressions.MergePair(col("syms"), "a", "b").as("fast"),
        spec.as("spec"))
      .filter(!(col("fast") <=> col("spec"))).count()
    assert(mism == 0)
  }

  // ---- MaxMultiplicity vs array_sort + run fold ------------------------

  test("MaxMultiplicity equals the sorted run-length fold") {
    val arrGen = Gen.choose(0, 20).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0L, 6L))) // small range → many runs
    val rows = seeded(arrGen, 300, 57L).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "g")
    val spec = aggregate(
      array_sort(col("g")),
      struct(lit(null).cast("long").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val mism = df.select(
        graft.expressions.MaxMultiplicity(col("g")).as("fast"),
        spec.as("spec"))
      .filter(!(col("fast") <=> col("spec"))).count()
    assert(mism == 0)
  }

  // ---- LuhnValid vs the sequence+substring fold ------------------------

  test("LuhnValid equals the composed fold (valid, invalid, empty)") {
    // digit-only inputs: on a NON-digit the composed fold THROWS under
    // ANSI (Spark 4 default) where the kernel returns NULL — the kernel
    // is the defensive side of an input both agree is out of contract
    // (callers feed regexp-extracted digit runs)
    val digitsGen = Gen.choose(0, 20).flatMap(k =>
      Gen.listOfN(k, Gen.numChar).map(_.mkString))
    val rows = (seeded(digitsGen, 300, 71L) ++
      Seq("", "4532015112830366", "1234567812345670"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "digits")
    val dcol = col("digits")
    val n = length(dcol)
    val sum = aggregate(
      sequence(lit(0), n - 1),
      lit(0L),
      (acc, i) => {
        val d = substring(dcol, n - i, lit(1)).cast("long")
        acc + when(i % 2 === 0, d)
          .otherwise(d * 2 - when(d * 2 > 9, 9L).otherwise(0L))
      })
    val spec = n >= 1 && sum % 10 === 0
    val mism = df.select(
        graft.expressions.LuhnValid(dcol).as("fast"), spec.as("spec"))
      .filter(!(col("fast") <=> col("spec"))).count()
    assert(mism == 0)
  }

  test("LuhnValid returns NULL on non-digit input (deliberate divergence " +
    "from the ANSI fold, which throws; out-of-contract — callers feed " +
    "regexp-extracted digit runs)") {
    val rows = Seq((1L, "4532a15112830366"), (2L, "12-34"), (3L, " 123"))
    val df = rows.toDF("id", "digits")
    val out = df.select(graft.expressions.LuhnValid(col("digits")).as("v"))
      .collect()
    assert(out.forall(_.isNullAt(0)),
      "non-digit input must yield NULL, not a verdict or an exception")
  }
}
