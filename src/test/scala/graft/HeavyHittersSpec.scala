package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitters
import graft.ops.HeavyHitters.MisraGriesAgg

/** Misra–Gries summary + the exact two-pass heavy-hitter op. The MG
  * guarantee under test: any value with frequency > n/(k+1) survives the
  * k-counter summary, through both the streaming reduce and the mergeable
  * merge path — so the verified output of heavyHitters is EXACT.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish fixture: value i repeated (50 - i) times, i = 0..49
  private val rows: Seq[String] =
    (0 until 50).flatMap(i => Seq.fill(50 - i)(s"v$i"))

  test("MG reduce path: no false negatives above n/(k+1), n tracked exactly") {
    val agg = MisraGriesAgg(10)
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    val n = rows.size
    assert(buf.n == n)
    val mustKeep = rows.groupBy(identity).collect {
      case (v, occ) if occ.size * 11 > n => v
    }
    assert(buf.counters.size <= 10)
    mustKeep.foreach(v =>
      assert(buf.counters.contains(v), s"$v must survive: ${buf.counters}"))
  }

  test("MG merge path: same guarantee when the stream is split and merged") {
    val agg = MisraGriesAgg(10)
    val parts = rows.grouped(97).toSeq // uneven partitions
    val bufs = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
    val merged = bufs.reduce(agg.merge)
    val n = rows.size
    assert(merged.n == n)
    val mustKeep = rows.groupBy(identity).collect {
      case (v, occ) if occ.size * 11 > n => v
    }
    assert(merged.counters.size <= 10)
    mustKeep.foreach(v =>
      assert(merged.counters.contains(v), s"$v must survive merge"))
  }

  test("decrement-all keeps the size bound and drops exhausted counters") {
    val agg = MisraGriesAgg(2)
    // a b c a b c ... : k=2 counters churn constantly, size stays <= 2
    val buf = Seq.fill(20)(Seq("a", "b", "c")).flatten
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.counters.size <= 2)
  }

  test("heavyHitters output is exactly the > n/k set, with exact counts") {
    val df = scala.util.Random.shuffle(rows).toDF("w")
    val got = HeavyHitters.heavyHitters(df, col("w"), k = 20)
      .as[(String, Long)].collect().toMap
    val n = rows.size
    val expected = rows.groupBy(identity).collect {
      case (v, occ) if occ.size * 20 > n => v -> occ.size.toLong
    }.toMap
    assert(got == expected)
  }

  test("null values are excluded from candidates AND from n") {
    // 10 nulls + {a x6, b x2}: with nulls excluded n=8, bar at n/k=4 —
    // only 'a' qualifies; if nulls leaked into n (18), the bar would be 9
    // and the result empty
    val df = (Seq.fill(10)(null: String) ++ Seq.fill(6)("a") ++
      Seq.fill(2)("b")).toDF("w")
    val got = HeavyHitters.heavyHitters(df, col("w"), k = 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 6L))
  }

  test("no hitters above the bar yields an empty frame with the right schema") {
    val df = (0 until 100).map(i => s"u$i").toDF("w") // all unique
    val got = HeavyHitters.heavyHitters(df, col("w"), k = 5)
    assert(got.columns.toSeq == Seq("value", "n_occurrences"))
    assert(got.count() == 0)
  }

  test("cmsAudit: one-sided error (est >= exact always), wide sketch is " +
    "exact, width-1 degenerates to the row total, absent probes read 0") {
    val data = (0 until 400).map(i => s"k${i % 7}").toDF("w") // 7 keys
    // narrow sketch: collisions allowed, but the estimate NEVER undercounts
    val narrow = HeavyHitters.cmsAudit(data, col("w"),
        (0 until 7).map(i => s"k$i") :+ "absent", depth = 2, width = 4)
      .as[(String, Long, Long, Long)].collect()
    assert(narrow.length == 8)
    narrow.foreach { case (v, exact, est, over) =>
      assert(est >= exact && over == est - exact, s"$v: $exact/$est")
      if (v != "absent") assert(exact == (if (v == "k0") 58 else 57))
    }
    // wide sketch: 7 keys in 4096 buckets x 4 rows -> no surviving collision
    val wide = HeavyHitters.cmsAudit(data, col("w"),
        (0 until 7).map(i => s"k$i"), depth = 4, width = 4096)
      .as[(String, Long, Long, Long)].collect()
    wide.foreach { case (v, exact, est, over) =>
      assert(over == 0L && est == exact, s"$v overcounted: $exact/$est")
    }
    // depth 1, width 1: every value lands in the single cell
    val degenerate = HeavyHitters.cmsAudit(data, col("w"), Seq("k0"),
        depth = 1, width = 1)
      .as[(String, Long, Long, Long)].collect().head
    assert(degenerate == (("k0", 58L, 400L, 342L)))
  }
}
