package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ranking, Skyline, TextAnalysis}

/** Round-10 retrieval composition: reciprocal-rank fusion, the idf-free
  * TF ranker, and the windowed 2-D Pareto frontier (incl. equivalence of
  * the bucketed two-pass path vs the quadratic NOT EXISTS definition). */
class RankingSkylineSpec extends SparkSpec {
  import spark.implicits._

  test("reciprocalRankFusion: exact ppb terms, missing items score " +
    "only their lists, ties break on id") {
    // list A: d1@1, d2@2 ; list B: d2@1, d3@2
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Ranking.reciprocalRankFusion(Seq(a, b), topK = 10)
      .select("doc_id", "rrf_ppb", "n_lists", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    val r1 = 1000000000L / 61   // 16393442
    val r2 = 1000000000L / 62   // 16129032
    // d2 in both lists at ranks 2 and 1; d1 only A@1; d3 only B@2
    assert(got == Seq((20L, r1 + r2, 2L, 1L), (10L, r1, 1L, 2L),
      (30L, r2, 1L, 3L)))
    val ex = intercept[IllegalArgumentException] {
      Ranking.reciprocalRankFusion(Seq(a))
    }
    assert(ex.getMessage.contains(">= 2"))
  }

  test("tfTopK: idf-free score 1e6*tf div len, per-term floors sum") {
    val docs = Seq((1L, "a a b"), (2L, "a c c c")).toDF("doc_id", "text")
    val q = Seq((7L, "a"), (7L, "c")).toDF("query_id", "term")
    val got = TextAnalysis.tfTopK(docs, q, k = 5)
      .select("doc_id", "score_ppm", "n_terms_hit", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    // doc1: a→2/3 = 666666 ; doc2: a→1/4=250000, c→3/4=750000 → 1000000
    assert(got == Seq((2L, 1000000L, 2L, 1L), (1L, 666666L, 1L, 2L)))
  }

  test("paretoFrontier2D: domination edges — equal x, equal y, exact " +
    "duplicates, single point") {
    // minimize x, maximize y
    val pts = Seq(
      (1L, 10L, 5L),  // frontier
      (2L, 10L, 7L),  // frontier (same x, higher y dominates id 1)
      (3L, 20L, 7L),  // dominated by 2 (higher x, same y)
      (4L, 20L, 9L),  // frontier
      (5L, 30L, 9L),  // dominated by 4
      (6L, 5L, 1L),   // frontier (cheapest)
      (7L, 5L, 1L)    // exact duplicate of 6 — both survive
    ).toDF("id", "x", "y")
    val got = Skyline.paretoFrontier2D(pts, "id", col("x"), col("y"))
      .as[(Long, Long, Long)].collect().map(_._1).sorted.toSeq
    assert(got == Seq(2L, 4L, 6L, 7L))
  }

  test("paretoFrontier2D: bucketed two-pass equals the NOT EXISTS " +
    "definition on pseudo-random data, any bucket count") {
    val pts = (1 to 400).map { i =>
      val h = TestHash.mix(i)
      (i.toLong, (h % 97).toLong, ((h / 97) % 89).toLong)
    }.toDF("id", "x", "y")
    pts.createOrReplaceTempView("sky_pts")
    val brute = spark.sql("""
      SELECT a.id FROM sky_pts a WHERE NOT EXISTS (
        SELECT 1 FROM sky_pts b
        WHERE (b.x < a.x AND b.y >= a.y) OR (b.x = a.x AND b.y > a.y))
    """).as[Long].collect().sorted.toSeq
    for (nb <- Seq(1, 3, 16)) {
      val fast = Skyline.paretoFrontier2D(pts, "id", col("x"), col("y"),
        buckets = nb).select("id").as[Long].collect().sorted.toSeq
      assert(fast == brute, s"buckets=$nb")
    }
  }

  test("luhnValid: known-good cards pass, off-by-one fails, odd lengths " +
    "double the right digits") {
    val cases = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),
      ("79927398713", true),        // the canonical Luhn example (11 digits)
      ("79927398714", false),
      ("0", true),                  // single zero: sum 0
      ("059", true)                 // odd length: 9 + 2*5=10→1 + 0 = 10
    ).toDF("num", "want")
    val got = cases.select(col("num"),
        TextAnalysis.luhnValid(col("num")).as("got"), col("want"))
      .as[(String, Boolean, Boolean)].collect()
    for ((n, g, w) <- got) assert(g == w, s"luhn($n)")
  }

  test("luhnCensus: extraction bounds (13-19), group with no candidates " +
    "keeps its row with NULL ppm") {
    val docs = Seq(
      ("a", "pay 4111111111111111 now"),        // 16, valid
      ("a", "ref 4111111111111112 bad"),        // 16, invalid
      ("a", "short 123456789012 run"),          // 12 digits — NOT a candidate
      ("b", "no digits at all")
    ).toDF("g", "text")
    val got = TextAnalysis.luhnCensus(docs, "g")
      .select("g", "n_candidates", "n_valid", "valid_ppm")
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 1L, Some(500000L)), ("b", 0L, 0L, None)))
  }

  test("budgetWaterFill: saturation cascade, surplus redistribution, " +
    "missing source = avail 0, budget conservation") {
    import graft.ops.Sampling
    val corpus = Seq(("en", 100L), ("en", 100L), ("de", 10L), ("es", 300L))
      .toDF("src", "n")
    // targets: en 50%, de 25%, es 25%; budget 400.
    // round 1: λ=400/1e6 per ppm → de demand 100 > avail 10 → de saturates
    // round 2: num=390, den=750000 → en demand 260 > avail 200 → en sat
    // round 3: num=190, den=250000 → es alloc 190 ≤ 300 → done
    val got = Sampling.budgetWaterFill(corpus, "src", col("n"),
        Seq("en" -> 500000L, "de" -> 250000L, "es" -> 250000L),
        budget = 400L)
      .select("source", "avail", "allocation", "saturated")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("de") == (("de", 10L, 10L, true)))
    assert(got("en") == (("en", 200L, 200L, true)))
    assert(got("es") == (("es", 300L, 190L, false)))
    // a target absent from the corpus: avail 0, saturated at 0
    val got2 = Sampling.budgetWaterFill(corpus, "src", col("n"),
        Seq("en" -> 500000L, "xx" -> 500000L), budget = 100L)
      .select("source", "avail", "allocation", "saturated")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got2("xx") == (("xx", 0L, 0L, true)))
    assert(got2("en")._3 == 100L) // xx's share redistributes fully
    intercept[IllegalArgumentException] {
      Sampling.budgetWaterFill(corpus, "src", col("n"),
        Seq("en" -> 999999L), budget = 1L) // ppm doesn't total 1e6
    }
  }

  test("budgetWaterFillShare: budget basis is the TARGETS' availability " +
    "only — non-target and NULL sources cannot inflate it") {
    import graft.ops.Sampling
    val corpus = Seq(Some("en") -> 200L, Some("de") -> 10L,
        Some("es") -> 300L,
        Some("xx") -> 1000L, // non-target: must not count toward budget
        (None: Option[String]) -> 500L) // NULL source: ditto
      .toDF("src", "n")
    // target avail = 510 → budget = 510·95//100 = 484
    // round 1: de 121>10 sat, en 242>200 sat; round 2: es ← 274
    val got = Sampling.budgetWaterFillShare(corpus, "src", col("n"),
        Seq("en" -> 500000L, "de" -> 250000L, "es" -> 250000L),
        shareNum = 95L, shareDen = 100L)
      .select("source", "avail", "allocation", "saturated")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") == (("en", 200L, 200L, true)))
    assert(got("de") == (("de", 10L, 10L, true)))
    assert(got("es") == (("es", 300L, 274L, false)))
    intercept[IllegalArgumentException] {
      Sampling.budgetWaterFillShare(corpus, "src", col("n"),
        Seq("en" -> 1000000L), shareNum = 101L, shareDen = 100L)
    }
  }

  test("tripletMining: hardest positive and hardest negative per anchor, " +
    "anchors missing a half yield no row") {
    import graft.ops.Similarity
    // all vectors in ONE bucket direction-wise: x-dominant positives,
    // a slightly rotated negative; labels 1/1/1 and 2; vector (9,1) is
    // label 2 so anchor (10,0) has pos (8,0) [cos 1] over (0,10).
    val vecs = Seq(
      (1L, 1, Seq(10.0f, 1.0f)),
      (2L, 1, Seq(8.0f, 0.8f)),    // same direction as 1 → pos for 1
      (3L, 2, Seq(9.0f, 1.2f)),    // close but label 2 → neg for 1
      (4L, 1, Seq(10.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.tripletMining(vecs, "vec_id", "embedding",
        "label", numPlanes = 2)
      .select("anchor_id", "pos_id", "neg_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // every anchor sharing a bucket with both labels gets exactly one row
    assert(got.nonEmpty)
    val a1 = got.find(_._1 == 1L)
    assert(a1.exists(t => t._2 == 2L && t._3 == 3L),
      s"anchor 1 wants pos=2 (same direction, same label) neg=3: $got")
    // label-2 singleton can never have a positive half
    assert(!got.exists(_._1 == 3L))
  }
}

private object TestHash {
  /** Deterministic spread for spec data (no RNG in tests). */
  def mix(i: Int): Int = {
    var h = i * 0x9e3775cd
    h ^= h >>> 13; h *= 0x5bd1e995; h ^= h >>> 15
    math.abs(h)
  }
}
