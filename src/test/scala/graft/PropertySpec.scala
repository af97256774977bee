package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Etl

/** Property-style laws (SURVEY.md §5.3.2) over generated inputs:
  * bucket totality/adjacency, containment vs brute force, merge idempotence.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val tsGen: Gen[Timestamp] = for {
    day <- Gen.choose(0, 3650)
    sec <- Gen.choose(0, 86399)
  } yield new Timestamp(1577836800000L + day * 86400000L + sec * 1000L) // 2020+

  test("bucket law: non-midnight cut-off ⇒ end = start + 1 day; " +
    "start day-offset decided by time-of-day vs cut-off") {
    val cutoffs = Seq("00:30:00", "09:00:00", "12:00:00", "23:59:59")
    val stamps = gen(Gen.listOfN(300, tsGen), 1L)
    for (cutOff <- cutoffs) {
      val df = stamps.toDF("start")
      val got = df.select(
        date_format(col("start"), "HH:mm:ss").as("tod"),
        to_date(col("start")).as("day"),
        Etl.bucketStart(col("start"), cutOff).as("bs"),
        Etl.bucketEnd(col("start"), cutOff).as("be"))
        .withColumn("span_ok", datediff(col("be"), col("bs")) === 1)
        .withColumn("offset_ok",
          when(col("tod") < cutOff, col("bs") === date_sub(col("day"), 1))
            .otherwise(col("bs") === col("day")))
      assert(got.filter(!col("span_ok") || !col("offset_ok")).count() == 0,
        s"cutOff=$cutOff")
    }
  }

  test("bucket law: midnight cut-off ⇒ degenerate [day, day] window") {
    val stamps = gen(Gen.listOfN(200, tsGen), 2L)
    val got = stamps.toDF("start").select(
      (Etl.bucketStart(col("start"), "00:00:00") === to_date(col("start"))).as("a"),
      (Etl.bucketEnd(col("start"), "00:00:00") === to_date(col("start"))).as("b"))
    assert(got.filter(!col("a") || !col("b")).count() == 0)
  }

  test("interval containment matches a brute-force Scala check") {
    val recs = gen(Gen.listOfN(120, tsGen), 3L).zipWithIndex.map {
      case (t, i) =>
        (s"h$i", s"r$i", "DRM", t,
          new Timestamp(t.getTime + 2 * 3600 * 1000L), "DEV")
    }
    val asgs = gen(Gen.listOfN(40, for {
      t <- tsGen; span <- Gen.choose(0, 20); open <- Gen.prob(0.2)
    } yield (t, span, open)), 4L).zipWithIndex.map { case ((t, span, open), i) =>
      val end =
        if (open) None
        else Some(new Timestamp(t.getTime + span * 86400000L))
      ("DEV", s"P$i", t, end)
    }
    val today = "2031-01-01"
    val recsDf = recs.toDF("hash", "manufacturer_ref", "device_type",
      "start", "end", "device_id")
      .withColumn("patient_id", lit(null).cast("string"))
    val asgDf = asgs.toDF("device_id", "patient_id", "start_wear", "end_wear")
    val got = Stages2.resolve(recsDf, asgDf, today)
      .select($"hash", $"patient_id").as[(String, Option[String])]
      .collect().toMap

    def day(t: Timestamp): Long = t.getTime / 86400000L // UTC days
    val todayTs = Timestamp.valueOf("2031-01-01 00:00:00")
    val expected = recs.map { case (h, _, _, s, e, _) =>
      val matching = asgs.filter { case (_, _, ws, we) =>
        val lo = day(ws)
        val hi = day(we.getOrElse(todayTs))
        day(s) >= lo && day(s) <= hi && day(e) >= lo && day(e) <= hi
      }
      // first-match order: raw start_wear epoch (the _a_ord), then patient
      val best = matching.sortBy { case (_, p, ws, _) => (ws.getTime / 1000, p) }.headOption
      h -> best.map(_._2)
    }.toMap
    assert(got == expected)
  }

  test("connectedComponents matches brute-force union-find on random graphs") {
    val rng = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val n = 60
      // sparse random graph: ~n edges -> a mix of chains, trees, cycles,
      // singletons-in-pairs; node ids sparse (×7+trial) so labels aren't
      // accidentally dense
      val edges = (0 until n).map { _ =>
        val a = rng.nextInt(n).toLong * 7 + trial
        val b = rng.nextInt(n).toLong * 7 + trial
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      // union-find ground truth
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val roots = nodes.map(v => v -> find(v)).toMap
      val expected = nodes.map(v =>
        v -> nodes.filter(u => roots(u) == roots(v)).min).toMap
      val got = graft.ops.Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
      // the adversarial-diameter fallback must agree on the same graphs:
      // maxRounds=0 skips the label loop entirely and forces contraction
      val viaStars = graft.ops.Dedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b", maxRounds = 0)
        .as[(Long, Long)].collect().toMap
      assert(viaStars == expected, s"trial $trial (star contraction)")
    }
  }

  test("connectedComponents survives a 10^4-node path graph (adversarial diameter)") {
    // a pure chain is the worst case for label propagation: diameter n-1.
    // pointer jumping converges in O(log n) rounds; every node must label
    // to the chain head
    val n = 10000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = graft.ops.Dedup.connectedComponents(
      chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
    assert(got.count() == n)
    assert(got.filter($"canonical_id" =!= 0L).count() == 0)
  }

  test("star-contraction fallback converges on a long chain when the label loop is capped") {
    // force the fallback with a round budget far below the chain's needs
    val n = 2000L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val got = graft.ops.Dedup.connectedComponents(
      chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b", maxRounds = 1)
    assert(got.count() == n)
    assert(got.filter($"canonical_id" =!= 0L).count() == 0)
  }

  test("pigeonhole simHashPairs is COMPLETE vs brute-force Hamming pairs") {
    // The exact-pair path (Dedup.simHashPairs, blockBits=0) rests on the
    // pigeonhole argument: distance <= k means at least one of the k+1 bit
    // blocks matches exactly. Verify completeness (and soundness) against
    // an all-pairs O(n^2) check on random signatures, across k values that
    // exercise both even (32/2, 32/4) and uneven (32/3) block widths.
    val rng = new scala.util.Random(41)
    for (maxHamming <- Seq(1, 2, 3)) {
      // bases plus near-duplicates with <= maxHamming+1 flipped bits, so
      // both accepted and just-rejected distances occur at volume
      val bases = (0 until 30).map(i => (i.toLong, rng.nextLong() & 0xFFFFFFFFL))
      val derived = (0 until 50).map { i =>
        val (_, base) = bases(rng.nextInt(bases.length))
        val flips = rng.nextInt(maxHamming + 2)
        val sig = (0 until flips).foldLeft(base)((s, _) => s ^ (1L << rng.nextInt(32)))
        (100L + i, sig)
      }
      val docs = bases ++ derived
      val expected = (for {
        (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxHamming
      } yield (ia, ib, h.toLong)).toSet
      val got = graft.ops.Dedup.simHashPairs(
        docs.toDF("doc_id", "simhash"), "doc_id", maxHamming = maxHamming,
        blockBits = 0)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"maxHamming=$maxHamming: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("symmetric-delete editDistancePairs is COMPLETE vs brute-force Levenshtein") {
    // The q47 path's exactness rests on the SymSpell argument: lev(a,b)<=k
    // implies a shared <=k-deletion variant. Verify against all-pairs
    // ground truth over a vocabulary dense in near-misses (short strings
    // over a 3-letter alphabet: substitutions, insertions, deletions,
    // transpositions all occur), for both supported thresholds.
    val rng = new scala.util.Random(7)
    val alpha = "abc"
    val words = (0 until 120).map { i =>
      val len = 1 + rng.nextInt(5)
      (i.toLong, (0 until len).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    }.distinctBy(_._2) // distinct strings: pairs at dist 0 are out of scope
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (maxDist <- Seq(1, 2)) {
      val expected = (for {
        (ia, sa) <- words; (ib, sb) <- words if ia < ib
        d = lev(sa, sb) if d <= maxDist
      } yield (ia, ib, d.toLong)).toSet
      val got = graft.ops.Fuzzy.editDistancePairs(
        words.toDF("id", "s"), "id", "s", blockCols = Nil, maxDist = maxDist)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"maxDist=$maxDist: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("BPE law: encode preserves content — concatenated tokens rebuild " +
    "every word, for any trained merge count") {
    import graft.ops.TextAnalysis
    // random lowercase words over a 3-letter alphabet: high pair density
    // so merges actually fire at every round count
    val wordGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val docs = (0 until 30).map { i =>
      (i.toLong, gen(Gen.listOfN(12, wordGen), 100L + i).mkString(" "))
    }.toDF("doc_id", "text")
    for (rounds <- Seq(1, 4)) {
      val merges = TextAnalysis.bpeTrain(docs, rounds = rounds)._2
        .orderBy("round").as[(Int, String, String, Long)].collect()
        .map(m => (m._2, m._3)).toSeq
      // glue in the CARRIED (word_pos, token_pos) order — collect_list
      // order is arbitrary, which is exactly why bpeEncode emits positions
      val rebuilt = TextAnalysis.bpeEncode(docs, merges)
        .groupBy("doc_id")
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("word_pos"),
            col("token_pos"), col("token")))),
          x => x.getField("token"))).as("glued"))
        .as[(Long, String)].collect().toMap
      val expected = docs.as[(Long, String)].collect().toMap
        .map { case (k, v) => k -> v.replace(" ", "") }
      assert(rebuilt == expected,
        s"token concatenation must reproduce the text (rounds=$rounds)")
    }
  }

  test("MJPEG round-trip law: any frame count/geometry/gray survives " +
    "build → walk → decode; arbitrary bytes never crash the walker") {
    import graft.ops.Multimodal
    val cases = for (i <- 0 until 12) yield {
      val w = gen(Gen.choose(1, 40), 200L + i)
      val h = gen(Gen.choose(1, 40), 300L + i)
      val grays = gen(Gen.listOfN(gen(Gen.choose(0, 4), 400L + i),
        Gen.choose(0, 255)), 500L + i)
      (i.toLong, w, h, grays)
    }
    val rows = cases.map { case (id, w, h, gs) =>
      (id, Multimodal.buildMjpegAvi(33333, w, h, gs))
    }.toDF("doc_id", "payload")
    val got = Multimodal.decodeMjpegFrames(spark, rows)
      .collect().groupBy(_.doc_id)
    for ((id, w, h, gs) <- cases) {
      val fs = got.getOrElse(id, Array.empty)
      assert(fs.length == gs.length, s"doc $id: all frames decode")
      assert(fs.forall(f => f.width == w && f.height == h))
    }
    // fuzz: random byte blobs (including RIFF-prefixed garbage) yield
    // zero rows, never an exception
    val junk = (0 until 20).map { i =>
      val bytes = gen(Gen.listOfN(gen(Gen.choose(0, 64), 600L + i),
        Gen.choose(-128, 127).map(_.toByte)), 700L + i).toArray
      val prefixed =
        if (i % 2 == 0) "RIFF".getBytes("ISO-8859-1") ++ bytes else bytes
      (i.toLong, prefixed)
    }.toDF("doc_id", "payload")
    assert(Multimodal.decodeMjpegFrames(spark, junk).count() == 0)
  }

  test("ngramContainment matches brute-force shingle-set math on random docs") {
    val word = Gen.oneOf((1 to 12).map(i => s"w$i"))
    val doc = Gen.choose(3, 25).flatMap(n => Gen.listOfN(n, word))
    val docs = gen(Gen.listOfN(30, doc), 7L).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val df = docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("m"))
    val got = graft.ops.Dedup.ngramContainment(df, "doc_id", "text",
      blockCols = Seq("lang", "source"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    def shingles(ws: Seq[String]): Set[String] =
      if (ws.size < 3) Set.empty
      else (0 to ws.size - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    val sets = docs.map { case (id, text) => id -> shingles(text.split(" ")) }.toMap
    val expected = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      inter = (sets(a) intersect sets(b)).size
      if inter > 0 && sets(a).nonEmpty && sets(b).nonEmpty
    } yield (a, b) -> ((inter.toLong,
      inter.toDouble / sets(a).size, inter.toDouble / sets(b).size))).toMap
    assert(got == expected,
      s"containment diverged from brute force: got ${got.size}, expected ${expected.size}")
  }

  test("quantileBins matches a brute-force ntile deal on random groups") {
    val row = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 40L)          // dense -> plenty of ties
    } yield (g, v)
    for (seed <- 1L to 3L) {
      val rows = gen(Gen.listOfN(120, row), seed).zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
      val got = graft.ops.Profile.quantileBins(
        rows.toDF("g", "v", "id").repartition(7), "g", "v", "id", nBins = 7)
        .as[(String, Int, Long, Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val n = sorted.size
        val (base, rem) = (n / 7, n % 7)
        val sizes = (0 until 7).map(j => base + (if (j < rem) 1 else 0))
        val offs = sizes.scanLeft(0)(_ + _)
        (0 until 7).filter(sizes(_) > 0).map { j =>
          val bucket = sorted.slice(offs(j), offs(j + 1))
          (g, j + 1, bucket.size.toLong,
            bucket.map(_._2).min, bucket.map(_._2).max)
        }
      }.toSet
      assert(got == want, s"seed $seed: ntile deal diverged")
    }
  }

  test("sourceDriftTvd matches brute-force rational TVD; bounded in [0,1)") {
    val word = Gen.oneOf((1 to 9).map(i => s"t$i"))
    val doc = for {
      s <- Gen.oneOf("s1", "s2", "s3")
      n <- Gen.choose(1, 15)
      ws <- Gen.listOfN(n, word)
    } yield (s, ws.mkString(" "))
    for (seed <- 1L to 3L) {
      val docs = gen(Gen.listOfN(40, doc), seed)
      val got = graft.ops.TextAnalysis.sourceDriftTvd(
        docs.toDF("source", "text").repartition(5))
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      val toks = docs.flatMap { case (s, t) => t.split(" ").map(s -> _) }
      val corpus = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toLong
      for ((src, st) <- toks.groupBy(_._1)) {
        val cs = st.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val ns = st.size.toLong
        // keysIterator, not keys: mapping over the key SET would dedup
        // equal |…| terms and silently undercount the sum
        val tvd = corpus.keysIterator.map { t =>
          math.abs(cs.getOrElse(t, 0L) * n - corpus(t) * ns).toDouble
        }.sum / (2.0 * ns * n)
        val r = got(src)
        assert(r._2 == ns && r._3 == cs.size)
        assert(math.abs(r._4 - tvd) < 1e-12, s"seed $seed src $src")
        assert(r._4 >= 0.0 && r._4 < 1.0)
      }
    }
  }

  test("winsorize mean sits inside [p_lo, p_hi] and matches brute force") {
    val row = for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.choose(0L, 1000L)
    } yield (g, v)
    for (seed <- 1L to 3L) {
      val rows = gen(Gen.listOfN(80, row), seed)
      val got = graft.ops.Profile.winsorize(
        rows.toDF("g", "v").repartition(6), "g", "v")
        .as[(String, Long, Double, Double, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      for ((g, rs) <- rows.groupBy(_._1)) {
        val vs = rs.map(_._2.toDouble).sorted
        def q(p: Double): Double = {       // Spark/DuckDB linear interpolation
          val rank = p * (vs.size - 1)
          val lo = rank.toInt
          if (lo == vs.size - 1) vs(lo)
          else vs(lo) + (rank - lo) * (vs(lo + 1) - vs(lo))
        }
        val (pLo, pHi) = (q(0.05), q(0.95))
        val clipped = vs.map(v => math.min(math.max(v, pLo), pHi))
        val r = got(g)
        assert(math.abs(r._3 - pLo) < 1e-9 && math.abs(r._4 - pHi) < 1e-9)
        assert(math.abs(r._7 - clipped.sum / clipped.size) < 1e-9,
          s"seed $seed group $g")
        assert(r._7 >= r._3 - 1e-9 && r._7 <= r._4 + 1e-9)
      }
    }
  }

  test("transitionMatrix: per-src counts total the transitions; ppm sums to ~1e6") {
    val row = for {
      u <- Gen.choose(1L, 8L)
      t <- Gen.oneOf("a", "b", "c", "d")
    } yield (u, t)
    for (seed <- 1L to 3L) {
      val rows = gen(Gen.listOfN(100, row), seed).zipWithIndex
        .map { case ((u, t), i) =>
          (u, new Timestamp(1700000000000L + i * 1000L), t, i.toLong)
        }
      val got = graft.ops.EventAnalytics.transitionMatrix(
        rows.toDF("user_id", "ts", "event_type", "event_id").repartition(5),
        "user_id", "ts", "event_type", "event_id")
        .as[(String, String, Long, Long)].collect()
      val wantPairs = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2.getTime, e._4)).map(_._3).sliding(2)
          .collect { case Seq(a, b) => (a, b) }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got.map(r => (r._1, r._2) -> r._3).toMap == wantPairs,
        s"seed $seed")
      for ((src, g) <- got.groupBy(_._1)) {
        val ppm = g.map(_._4).sum
        assert(ppm <= 1000000L && 1000000L - ppm < g.size,
          s"seed $seed src $src: floor-div ppm sum $ppm")
      }
    }
  }

  test("heavyHitters equals the exact > n/k filter on random zipf-ish draws") {
    val value = Gen.frequency(
      (50, Gen.const("alpha")), (25, Gen.const("beta")),
      (10, Gen.const("gamma")), (15, Gen.choose(0, 500).map(i => s"tail$i")))
    for (seed <- 1L to 3L) {
      val data = gen(Gen.listOfN(2000, value), seed)
      val df = data.toDF("v")
      val got = graft.ops.HeavyHitters.heavyHitters(df, col("v"), k = 15)
        .as[(String, Long)].collect().toMap
      val n = data.size
      val expected = data.groupBy(identity).collect {
        case (v, occ) if occ.size * 15 > n => v -> occ.size.toLong
      }.toMap
      assert(got == expected, s"seed $seed: $got != $expected")
    }
  }

  test("no-override merge is idempotent: merge(merge(s,u),u) == merge(s,u)") {
    val base = gen(Gen.listOfN(100, Gen.option(Gen.identifier)), 5L).zipWithIndex
      .map { case (v, i) => (s"k$i", v) }
    val upd = gen(Gen.listOfN(100, Gen.option(Gen.identifier)), 6L).zipWithIndex
      .map { case (v, i) => (s"k$i", v) }
    def merge(s: Map[String, Option[String]], u: Map[String, Option[String]]) =
      s.map { case (k, v) => k -> v.orElse(u.getOrElse(k, None)) }
    val sm = base.toMap
    val um = upd.toMap
    val once = merge(sm, um)
    assert(merge(once, um) == once)
    // and the DataFrame realization agrees
    val df = base.toDF("key", "v")
    val u = upd.toDF("ukey", "uv")
    val merged = df.join(u, col("key") === col("ukey"), "left")
      .select(col("key"), coalesce(col("v"), col("uv")).as("v"))
    val got = merged.as[(String, Option[String])].collect().toMap
    assert(got == once)
  }

  test("theilSenPerKey equals the brute-force lower-median pairwise slope") {
    val pts = gen(Gen.listOfN(40, for {
      k <- Gen.oneOf("a", "b", "c")
      x <- Gen.choose(0L, 30L)
      y <- Gen.choose(-50L, 50L)
    } yield (k, x, y)), 7L)
      // distinct x per key (the daily-grid contract)
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val got = graft.ops.Regression.theilSenPerKey(
        pts.toDF("k", "x", "y"), col("k"), col("x"), col("y"))
      .select("key", "n_pairs", "slope_num", "slope_den")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    pts.groupBy(_._1).foreach { case (k, rows) =>
      val slopes = (for {
        a <- rows; b <- rows if a._2 < b._2
      } yield (b._3 - a._3, b._2 - a._2))
        .sortBy { case (n, d) => (n.toDouble / d, n, d) }
      if (slopes.isEmpty) assert(!got.contains(k))
      else {
        val med = slopes(((slopes.size + 1) / 2 - 1).toInt)
        assert(got(k) == ((slopes.size.toLong, med._1, med._2)), s"key $k")
      }
    }
  }

  test("overlapJoin equals the brute-force inequality join on random intervals") {
    val iv = gen(Gen.listOfN(60, for {
      k <- Gen.oneOf(1L, 2L)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 40L)
    } yield (k, s, s + len)), 11L)
      .zipWithIndex.map { case ((k, s, e), i) => (k, i.toLong, s, e) }
    val (lRows, rRows) = iv.partition(_._2 % 2 == 0)
    val l = lRows.toDF("k", "id", "s", "e")
    val r = rRows.toDF("k", "id", "s", "e")
    for (width <- Seq(1L, 7L, 64L)) {
      val got = graft.ops.Intervals.overlapJoin(l, r, "k", "id", "s", "e",
          "id", "s", "e", bucketWidth = width)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val brute = (for {
        a <- lRows; b <- rRows
        if a._1 == b._1 && a._3 <= b._4 && b._3 <= a._4
      } yield (a._2, b._2)).toSet
      assert(got == brute, s"width $width")
    }
  }

  test("histogramFixed bin populations equal the brute-force clamp rule") {
    val vals = gen(Gen.listOfN(200, for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.choose(-3000L, 18000L) // cents, some out of [0, 10000)
    } yield (g, v / 100.0)), 13L)
    val got = graft.ops.Profile.histogramFixed(vals.toDF("g", "v"),
        "g", "v", 0L, 10000L, 10)
      .select("g", "bin", "n_rows").as[(String, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val brute = vals
      .map { case (g, v) =>
        val cents = math.rint(v * 100).toLong
        (g, math.min(9L, math.max(0L, cents / 1000L)))
      } // cents here are exact multiples of 100 → rint ≡ the decimal cast
      .groupBy(identity).map { case (k, rows) => k -> rows.size.toLong }
    assert(got == brute)
  }

  test("triangle-salt law: jaroWinklerPairs output is IDENTICAL for salt " +
    "1, 2, 7, 16 on random corpora (the cell decomposition is exact)") {
    val words = Seq("alpha", "beta", "betta", "gamma", "gamm", "delta")
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.oneOf(words), Gen.oneOf(words), Gen.oneOf(words)))
    val rows = gen(Gen.Parameters.default, Seed(901L)).get
      .zipWithIndex.map { case ((a, b, c), i) => (i.toLong, s"$a $b $c") }
    val df = rows.toDF("id", "name")
    def pairs(salt: Int) = graft.ops.Fuzzy.jaroWinklerPairs(df, "id", "name",
        split(col("name"), " ").getItem(0), minSimPpm = 850000L, salt = salt)
      .as[(Long, Long, Long)].collect().toSet
    val base = pairs(1) // salt=1 ≡ the naive per-block self-join
    assert(base.nonEmpty, "degenerate fixture: no qualifying pairs")
    Seq(2, 7, 16).foreach(s => assert(pairs(s) == base, s"salt=$s diverged"))
  }

  test("passageCensus law: matches a brute-force Scala census on random " +
    "corpora, for window sizes 1, 3, 8") {
    val vocab = Seq("a", "b", "c", "d")
    val gen = Gen.listOfN(25, Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab))))
    val docs = gen(Gen.Parameters.default, Seed(902L)).get
      .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    for (w <- Seq(1, 3, 8)) {
      val brute: Map[Long, (Long, Long, Long)] = {
        val chunks = docs.map { case (id, t) =>
          id -> t.split(" ").grouped(w).map(_.mkString(" ")).toSeq }
        val nd = chunks.flatMap { case (id, ps) => ps.distinct.map(_ -> id) }
          .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct.size }
        chunks.map { case (id, ps) =>
          val dup = ps.count(p => nd(p) >= 2).toLong
          id -> (ps.size.toLong, dup, 1000000L * dup / ps.size)
        }.toMap
      }
      val got = graft.ops.TextAnalysis.passageCensus(
          docs.toDF("doc_id", "text"), window = w)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == brute, s"window=$w")
    }
  }

  test("approxQuantileAudit law: contract certified across accuracies and " +
    "skewed distributions") {
    val skewed = (1 to 2000).map(i => (i.toLong * i)) ++ Seq.fill(500)(7L)
    val df = skewed.toDF("v")
    for (acc <- Seq(100, 1000, 10000)) {
      val rows = graft.ops.Profile.approxQuantileAudit(df, col("v"),
          Seq(10000L, 500000L, 990000L), accuracy = acc)
        .as[(Long, Long, Boolean)].collect()
      assert(rows.length == 3 && rows.forall(_._3), s"accuracy=$acc: $rows")
    }
  }

  test("mixtureRebalance law: realized counts equal the closed-form " +
    "want on random group sizes, selection is the hash-order prefix") {
    val targets = Seq("g0" -> 400000L, "g1" -> 350000L, "g2" -> 250000L)
    for (seed <- Seq(11L, 12L, 13L)) {
      val sizes = gen(Gen.listOfN(3, Gen.chooseNum(0, 80)), seed)
      val rows = targets.map(_._1).zip(sizes).flatMap { case (g, n) =>
        (0 until n).map(i => (s"$g-$i".hashCode.toLong * 100 + i, g))
      }
      val df = rows.toDF("id", "grp")
      val got = graft.ops.Sampling.mixtureRebalance(df, "grp", "id", targets)
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      // closed form in plain Scala
      val n = targets.map(_._1).zip(sizes.map(_.toLong)).toMap
      val t = targets.map { case (g, ppm) => n(g) * 1000000L / ppm }.min
      val want = targets.map { case (g, ppm) => g -> t * ppm / 1000000L }
        .filter(_._2 > 0).toMap
      assert(got == want, s"seed=$seed sizes=$sizes: got $got want $want")
      // and the selected rows are the salted-hash-order prefix per group
      val sel = graft.ops.Sampling.mixtureRebalance(df, "grp", "id", targets)
        .select("grp", "id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
      def h(id: Long) = {
        val d = java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"mix:$id".getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      }
      for ((g, ppm) <- targets; if want.getOrElse(g, 0L) > 0) {
        val ids = rows.filter(_._2 == g).map(_._1)
        val expect = ids.sortBy(id => (h(id), id)).take(want(g).toInt).toSet
        assert(sel(g) == expect, s"seed=$seed group=$g prefix mismatch")
      }
    }
  }

  test("hashedNgramShift law: flipping the target predicate negates " +
    "every doc's shift_sum on random corpora; n_bigrams = words - 1") {
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    for (seed <- Seq(21L, 22L)) {
      val docs = gen(Gen.listOfN(40, Gen.chooseNum(1, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)))), seed)
        .zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      val df = docs.toDF("doc_id", "text")
      val pred = col("doc_id") % 3 === 0
      def run(p: org.apache.spark.sql.Column) =
        graft.ops.TextAnalysis.hashedNgramShift(df, p, buckets = 64)
          .as[(Long, Boolean, Long, Long, Long)].collect()
          .map(r => r._1 -> r).toMap
      val a = run(pred)
      val b = run(!pred)
      for ((id, text) <- docs) {
        assert(a(id)._3 == text.split(" ").length - 1)
        assert(b(id)._4 == -a(id)._4, s"seed=$seed doc=$id flip law broke")
      }
    }
  }

  test("url law: canonicalizeUrl is IDEMPOTENT over generated messy urls " +
    "(canon(canon(u)) = canon(u)) and never re-grows a tracking param") {
    import graft.ops.UrlOps
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("Ex.COM", "a.b.ex.com", "WWW.Ex.Com")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/p", "/p/q/", "/p//")
      qs <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "gclid=9", "z="))
      frag <- Gen.oneOf("", "#f")
    } yield s"$scheme://$host$port$path" +
      (if (qs.isEmpty) "" else qs.mkString("?", "&", "")) + frag
    for (seed <- 1L to 3L) {
      val urls = gen(Gen.listOfN(200, urlGen), seed)
      val once = urls.toDF("u")
        .select(UrlOps.canonicalizeUrl(col("u")).as("c1"))
        .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
        .as[(String, String)].collect()
      for ((c1, c2) <- once) {
        assert(c1 == c2, s"not idempotent: $c1 -> $c2")
        assert(!c1.contains("utm_") && !c1.contains("gclid"),
          s"tracking param survived: $c1")
      }
    }
  }

  test("skyline law: the frontier is IDEMPOTENT (frontier(frontier(S)) = " +
    "frontier(S)) and every non-frontier point is dominated by a " +
    "frontier point") {
    import graft.ops.Skyline
    for (seed <- 4L to 5L) {
      val pts = gen(Gen.listOfN(300,
        Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L))), seed)
        .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val df = pts.toDF("id", "x", "y")
      val f1 = Skyline.paretoFrontier2D(df, "id", col("x"), col("y"))
        .as[(Long, Long, Long)].collect().toSet
      val f2 = Skyline.paretoFrontier2D(
          f1.toSeq.toDF("id", "x", "y"), "id", col("x"), col("y"))
        .as[(Long, Long, Long)].collect().toSet
      assert(f1 == f2, s"seed=$seed idempotence broke")
      val front = f1.map { case (_, x, y) => (x, y) }
      for ((id, x, y) <- pts if !f1.exists(_._1 == id)) {
        assert(front.exists { case (fx, fy) =>
          (fx < x && fy >= y) || (fx <= x && fy > y) },
          s"seed=$seed dropped point ($id,$x,$y) not dominated")
      }
    }
  }

  test("kcore law: the k-core is a FIXPOINT (kCore of the core's edge " +
    "set = the core) and is contained in the (k-1)-core") {
    import graft.ops.Graph
    for (seed <- 6L to 7L) {
      val edges = gen(Gen.listOfN(250,
        Gen.zip(Gen.choose(1L, 40L), Gen.choose(1L, 40L))), seed)
        .toDF("a", "b")
      val core3 = Graph.kCore(edges, k = 3)
        .as[(Long, Long)].collect().toMap
      val core2 = Graph.kCore(edges, k = 2)
        .as[(Long, Long)].collect().toMap
      assert(core3.keySet.subsetOf(core2.keySet), s"seed=$seed nesting")
      // rebuild the core subgraph's edges and re-peel: nothing changes
      val nodes = core3.keySet
      val coreEdges = edges.as[(Long, Long)].collect()
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b && nodes(a) && nodes(b) }
        .distinct
      if (coreEdges.nonEmpty) {
        val again = Graph.kCore(coreEdges.toSeq.toDF("a", "b"), k = 3)
          .as[(Long, Long)].collect().toMap
        assert(again == core3, s"seed=$seed fixpoint broke")
      } else assert(core3.isEmpty)
    }
  }

  test("luhn law: for ANY digit string there is exactly ONE check digit " +
    "that makes it valid (the append-check-digit construction)") {
    import graft.ops.TextAnalysis
    val digitsGen = Gen.listOfN(15, Gen.choose(0, 9)).map(_.mkString)
    val bodies = gen(Gen.listOfN(60, digitsGen), 8L)
    val rows = for (b <- bodies; d <- 0 to 9) yield (b, d, s"$b$d")
    val got = rows.toDF("body", "d", "num")
      .select(col("body"), TextAnalysis.luhnValid(col("num")).as("ok"))
      .as[(String, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.count(_._2)).toMap
    for (b <- bodies) assert(got(b) == 1, s"body $b had ${got(b)} valid")
  }

  test("rrf law: fusing a ranking with ITSELF preserves its order (rank " +
    "transform is monotone), and contributions are order-invariant " +
    "across the input list") {
    import graft.ops.Ranking
    val r = (1 to 30).map(i => (1L, i.toLong * 7 % 31, i.toLong))
      .toDF("query_id", "doc_id", "rank")
    val fused = Ranking.reciprocalRankFusion(Seq(r, r), topK = 30)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val orig = r.orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(fused == orig)
    val ab = Ranking.reciprocalRankFusion(Seq(r,
        r.withColumn("rank", col("rank"))), topK = 30)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val ba = Ranking.reciprocalRankFusion(Seq(
        r.withColumn("rank", col("rank")), r), topK = 30)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(ab == ba)
  }

  test("rendezvous law over arbitrary N < M: growing moves keys ONLY " +
    "into the new shards [N, M); prefix-consistency makes assignments " +
    "nested across every count in between") {
    // The law the (8,9) gate pins, generalized: a key's winner among
    // shards 0..N-1 stays its winner among 0..M-1 unless one of the NEW
    // shards outscores it — HRW scores are per-(key, shard), independent
    // of N, so assignments under growing counts form a chain.
    val df = spark.range(600).select(col("id").as("k"), lit(0L).as("g"))
    for ((n, m) <- Seq((2, 3), (3, 7), (5, 8), (7, 12))) {
      val a = graft.ops.Output.rendezvousAssign(df, "k", n, "sa")
      val b = graft.ops.Output.rendezvousAssign(df, "k", m, "sb")
        .select("k", "sb")
      val j = a.join(b, "k")
      val badMovers = j.filter(col("sa") =!= col("sb"))
        .filter(col("sb") < n).count()
      assert(badMovers == 0,
        s"$n->$m: a mover landed on a pre-existing shard")
      // census agrees with the direct count in BOTH directions
      val grow = graft.ops.Output.rendezvousMoveCensus(df, "k", "g", n, m)
        .head().getLong(2)
      val shrink = graft.ops.Output.rendezvousMoveCensus(df, "k", "g", m, n)
        .head().getLong(2)
      val direct = j.filter(col("sa") =!= col("sb")).count()
      assert(grow == direct && shrink == direct,
        s"$n<->$m: census $grow/$shrink vs direct $direct")
      // SHRINK law m -> n: movers are EXACTLY the keys whose winner was
      // removed (id >= n) — the q247 in-band contract over arbitrary
      // pairs, not just the gate's 9 -> 8
      val audit = graft.ops.Output.rendezvousShrinkAudit(df, "k", "g", m, n)
        .head()
      assert(audit.getAs[Boolean]("moves_only_from_removed"),
        s"$m->$n: a mover's before-shard survived the shrink")
      assert(audit.getAs[Long]("n_moved") == direct,
        s"$m->$n: shrink audit n_moved ${audit.getAs[Long]("n_moved")} " +
          s"vs direct $direct")
    }
  }

  test("incrementalMinMax law: incremental ≡ full recompute over the " +
    "effective multiset, for random bases and random valid deltas") {
    import graft.ops.Diff
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(0, 50) // small domain → plenty of duplicate values
    } yield (k, v / 10.0)
    for (seed <- 1L to 5L) {
      val baseRows = gen(Gen.listOfN(60, rowGen), seed)
      // valid deletes: drawn FROM the base multiset (each base row used
      // at most once); inserts unrestricted
      val nDel = gen(Gen.choose(0, baseRows.size), seed + 100)
      val dels = gen(Gen.pick(nDel, baseRows.indices), seed + 200)
        .map(baseRows).map { case (k, v) => (k, "D", v) }
      val inss = gen(Gen.listOfN(15, rowGen), seed + 300)
        .map { case (k, v) => (k, "I", v) }
      val base = baseRows.toDF("k", "value")
      val delta = (dels ++ inss).toList.toDF("k", "op", "value")
      val got = Diff.incrementalMinMax(base,
        Diff.minMaxCents(base, Seq("k"), "value"), delta, Seq("k"), "value")
        .select($"k", $"min_cents", $"max_cents")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      // effective multiset: base minus one occurrence per delete, plus inserts
      val remaining = scala.collection.mutable.ArrayBuffer(baseRows: _*)
      dels.foreach { case (k, _, v) =>
        remaining.remove(remaining.indexOf((k, v))) }
      val effective = (remaining.toSeq ++ inss.map(t => (t._1, t._3)))
      val full = Diff.minMaxCents(effective.toDF("k", "value"),
        Seq("k"), "value")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == full, s"seed=$seed")
    }
  }

  test("sessionizeCapped law: equals a per-key sequential fold of the " +
    "gap-or-cap rule, for random timelines") {
    import graft.ops.Sessionize
    val evGen = for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 500L) // seconds; dense → gaps and caps both fire
    } yield (k, t * 1000L)
    val (gapMs, capMs) = (30000L, 70000L)
    for (seed <- 1L to 5L) {
      val rows = gen(Gen.listOfN(120, evGen), seed).zipWithIndex
        .map { case ((k, ms), i) => (i.toLong + 1L, k, ms) }
      val df = rows.toDF("event_id", "user_id", "ms")
        .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      val got = Sessionize.sessionizeCapped(df, "user_id", "ts",
        "event_id", gapMs, capMs)
        .select($"user_id", $"session_idx", $"n_events", $"start_ms", $"end_ms")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      // reference: sequential fold per key over (ts, id)-sorted events
      val expected = rows.groupBy(_._2).toSeq.flatMap { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._1)).map(_._3)
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        var start = -1L; var last = -1L
        sorted.foreach { ts =>
          if (sessions.isEmpty || ts - last > gapMs || ts - start > capMs) {
            sessions += scala.collection.mutable.ArrayBuffer(ts); start = ts
          } else sessions.last += ts
          last = ts
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (k, i.toLong + 1L, s.size.toLong, s.head, s.last) }
      }.sorted
      assert(got == expected, s"seed=$seed")
    }
  }

  test("isqrt law: isqrt(c)^2 <= c < (isqrt(c)+1)^2 for arbitrary " +
    "counts, including perfect squares and their +-1 neighbors " +
    "(the double-rounding boundary cases)") {
    val rand = gen(Gen.listOfN(400,
      Gen.choose(0L, (1L << 52) - 1)), 7L)
    // adversarial: perfect squares straddle the floor(sqrt(double))
    // rounding boundary — exactly where the uncorrected form breaks
    val squares = gen(Gen.listOfN(200, Gen.choose(0L, (1L << 26) - 1)), 8L)
      .flatMap(s => Seq(s * s, s * s - 1, s * s + 1).filter(_ >= 0))
    val got = (rand ++ squares).toDF("c")
      .select(col("c"), graft.ops.Sampling.isqrt(col("c")).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (c, s) =>
      assert(s >= 0 && s * s <= c && (s + 1) * (s + 1) > c,
        s"isqrt($c) = $s")
    }
  }
}

/** Thin forwarding (keeps the spec readable). */
private object Stages2 {
  def resolve(records: org.apache.spark.sql.DataFrame,
              asg: org.apache.spark.sql.DataFrame, today: String) =
    graft.etl.Stages.resolvePatients(records, asg, today)
}
