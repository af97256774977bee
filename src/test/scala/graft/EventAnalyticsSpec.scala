package graft

import org.apache.spark.sql.functions.lit

import graft.ops.EventAnalytics

/** Funnel/retention (q115/q116 operators): the sequence edge cases the
  * synthetic events fixture can't pin exactly.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "s", "event_type")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")

  test("funnel: same-instant event can't satisfy the next step (strictly after)") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-01 10:00:00", "view"),   // same instant → NOT after
      (2L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-01 10:00:01", "view"))
    val got = EventAnalytics.funnel(e, "user_id", "ts", "event_type",
      Seq("click", "view"), "24 hours")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "click", 2L), (2, "view", 1L)))
  }

  test("funnel: deadline is inclusive; step time is the EARLIEST qualifier") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", "click"),
      (1L, "2024-01-02 10:00:00", "view"),       // exactly +24h → counts
      (1L, "2024-01-02 10:00:01", "purchase"),   // 1s after the view → counts
      (2L, "2024-01-01 10:00:00", "click"),
      (2L, "2024-01-02 10:00:01", "view"))       // past the deadline → out
    val got = EventAnalytics.funnel(e, "user_id", "ts", "event_type",
      Seq("click", "view", "purchase"), "24 hours")
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1, "click", 2L), (2, "view", 1L), (3, "purchase", 1L)))
  }

  test("transitionMatrix: per-user successor pairs, ppm floor division") {
    // user 1: a→b→a ; user 2: a→b — timelines never cross users
    val e = Seq(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 10:00:01", "b", 2L),
      (1L, "2024-01-01 10:00:02", "a", 3L),
      (2L, "2024-01-01 10:00:00", "a", 4L),
      (2L, "2024-01-01 10:00:05", "b", 5L))
      .toDF("user_id", "s", "event_type", "event_id")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val got = EventAnalytics.transitionMatrix(e, "user_id", "ts",
      "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    // a→b twice (both users), b→a once; src=a total 2, src=b total 1
    assert(got == Seq(("a", "b", 2L, 1000000L), ("b", "a", 1L, 1000000L)))
  }

  test("transitionMatrix: tie on ts breaks by the id column; probs split") {
    val e = Seq(
      (1L, "2024-01-01 10:00:00", "x", 2L),  // same instant — id orders x→y
      (1L, "2024-01-01 10:00:00", "y", 5L),
      (1L, "2024-01-01 10:00:01", "x", 7L),
      (1L, "2024-01-01 10:00:02", "z", 8L))
      .toDF("user_id", "s", "event_type", "event_id")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val got = EventAnalytics.transitionMatrix(e, "user_id", "ts",
      "event_type", "event_id")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    // sequence x→y→x→z: x→y 1, y→x 1, x→z 1; src=x has 2 → 500000 each
    assert(got == Seq(("x", "y", 1L, 500000L), ("x", "z", 1L, 500000L),
      ("y", "x", 1L, 1000000L)))
  }

  test("retention: offset counts are distinct users, cohort at offset 0") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", "view"),
      (1L, "2024-01-02 01:00:00", "view"),
      (1L, "2024-01-02 23:00:00", "view"),   // same user+day → one active row
      (2L, "2024-01-01 23:59:59", "view"),
      (3L, "2024-01-02 00:00:00", "view"))
    val got = EventAnalytics.retention(e, "user_id", "ts", Seq(0, 1))
      .as[(String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L),   // users 1 and 2
      ("2024-01-01", 1L, 1L),   // only user 1 came back next day
      ("2024-01-02", 0L, 1L)))  // user 3's cohort
  }

  test("sessionCooccurrence: per-session flags, gap splits, one-row rollup") {
    // user 1: session A (click+purchase), 40-min gap, session B (click only);
    // user 2: one session (purchase only)
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (1L, 2L, "2024-01-01 10:10:00", "purchase"),
      (1L, 3L, "2024-01-01 10:55:00", "click"),
      (2L, 4L, "2024-01-01 09:00:00", "purchase"))
      .toDF("user_id", "event_id", "s", "event_type")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val got = EventAnalytics.sessionCooccurrence(e, "user_id", "ts",
      "event_id", "event_type", "click", "purchase", gapMs = 30 * 60 * 1000L)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got == List((3L, 2L, 2L, 1L)))
  }

  test("runLength: splits on change, survives unordered tie ids, null-safe values") {
    // user 1 timeline: A A B A → runs (A,2) (B,1) (A,1); the second A-run's
    // opening row has the LARGER event_id arriving earlier in time
    val e = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "A"),
      (1L, 2L, "2024-01-01 10:01:00", "A"),
      (1L, 3L, "2024-01-01 10:02:00", "B"),
      (1L, 9L, "2024-01-01 10:03:00", "A"),
      (1L, 4L, "2024-01-01 10:04:00", "A"))   // id 4 AFTER id 9 in time
      .toDF("user_id", "event_id", "s", "event_type")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val got = EventAnalytics.runLength(e, "user_id", "ts", "event_id", "event_type")
      .orderBy("run_seq")
      .as[(Long, String, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, "A", 1L, 1L, 2L),
      (1L, "B", 2L, 3L, 1L),
      (1L, "A", 3L, 9L, 2L)))  // first_tie = 9, the temporal opener
  }

  private def evv(rows: (Long, Long, String, Double)*) =
    rows.toDF("user_id", "event_id", "s", "value")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")

  test("ewmaCents: hand-folded (3e+x) div 4 over the timeline, in cents") {
    // user 1: 1.00, 2.00, 3.00 -> e=100, (300+200)/4=125, (375+300)/4=168
    val e = evv(
      (1L, 3L, "2024-01-01 12:00:00", 3.00),   // out of input order on purpose
      (1L, 1L, "2024-01-01 10:00:00", 1.00),
      (1L, 2L, "2024-01-01 11:00:00", 2.00))
    val got = EventAnalytics.ewmaCents(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 300L, 168L)))
  }

  test("ewmaCents: same-instant ties break on the id column") {
    // both at 10:00 -> id 1 (4.00) folds first, then id 2 (8.00):
    // e = 400, (1200+800)/4 = 500
    val e = evv(
      (7L, 2L, "2024-01-01 10:00:00", 8.00),
      (7L, 1L, "2024-01-01 10:00:00", 4.00))
    val got = EventAnalytics.ewmaCents(e, "user_id", "ts", "event_id", "value")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 2L, 800L, 500L)))
  }

  test("tokenBucketAdmit: cap, rejection when empty, per-gap floor " +
    "(fractional credit does not carry), independent keys") {
    import org.apache.spark.sql.functions.col
    // cap 2, 1 token / 1000 ms
    val ev = Seq(
      (1L, 0L, 10L),     // fresh bucket: 2 → admit, 1 left
      (1L, 100L, 11L),   // admit, 0 left
      (1L, 200L, 12L),   // REJECT (gap 100ms floors to 0 tokens)
      (1L, 800L, 13L),   // REJECT (600ms more — floors to 0 AGAIN:
                         //   two sub-1000 gaps never sum to a token)
      (1L, 1900L, 14L),  // gap 1100 → +1 token, admit, 0 left
      (1L, 9900L, 15L),  // gap 8000 → +8 clamped to cap 2, admit, 1 left
      (2L, 50L, 20L)     // other key: fresh bucket, admit
    ).toDF("k", "ts", "id")
    val got = EventAnalytics.tokenBucketAdmit(ev, "k", col("ts"), "id",
        capacity = 2L, refillNum = 1L, refillDenMs = 1000L)
      .select("id", "admitted", "tokens_after")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (10L, true, 1L), (11L, true, 0L), (12L, false, 0L),
      (13L, false, 0L), (14L, true, 0L), (15L, true, 1L),
      (20L, true, 1L)))
    intercept[IllegalArgumentException] {
      EventAnalytics.tokenBucketAdmit(ev, "k", col("ts"), "id",
        capacity = 0L, refillNum = 1L, refillDenMs = 1000L)
    }
    // a NON-CASTABLE timestamp fails loudly (same contract as key/id);
    // NULL ts rows are the documented exclusion, not bad-data ones
    val badTs = Seq((1L, "not-a-ts", 10L)).toDF("k", "ts", "id")
    val ex = intercept[Exception] {
      EventAnalytics.tokenBucketAdmit(badTs, "k", col("ts"), "id",
        capacity = 2L, refillNum = 1L, refillDenMs = 1000L).collect()
    }
    assert(ex.getMessage.contains("must cast to long") ||
      Option(ex.getCause).exists(_.getMessage.contains("must cast to long")))
  }

  test("rollingDistinct: trailing window, intra-day dups collapse, " +
    "no phantom windows past the last day, nulls dropped") {
    // A active days 1 and 3 (twice on day 1), B active day 3; window = 2.
    // ends: (A,d1)→{d1,d2}; (A,d3)→{d3} (d4 > max day — capped);
    //       (B,d3)→{d3}  ⇒  d1:1, d2:1 (trailing!), d3:2
    val d1 = "2024-01-01"; val d3 = "2024-01-03"
    val e = ev(
      (1L, s"$d1 08:00:00", "x"), (1L, s"$d1 22:00:00", "x"),
      (1L, s"$d3 10:00:00", "x"), (2L, s"$d3 11:00:00", "x"))
      .unionByName(Seq((Option.empty[Long], s"$d1 09:00:00"))
        .toDF("user_id", "s")
        .withColumn("ts", $"s".cast("timestamp")).drop("s")
        .withColumn("event_type", lit("x")))
    val got = EventAnalytics.rollingDistinct(e, "user_id", "ts",
      windowDays = 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val day1 = java.sql.Timestamp.valueOf(s"$d1 00:00:00").getTime
    val dms = 86400000L
    assert(got == Seq((day1, 1L), (day1 + dms, 1L), (day1 + 2 * dms, 2L)))
  }

  test("rollingDistinct: windowDays = 1 is plain daily distinct; bad window throws") {
    val e = ev((1L, "2024-01-01 08:00:00", "x"),
      (2L, "2024-01-01 09:00:00", "x"),
      (1L, "2024-01-02 09:00:00", "x"))
    val got = EventAnalytics.rollingDistinct(e, "user_id", "ts", 1)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val day1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    assert(got == Seq((day1, 2L), (day1 + 86400000L, 1L)))
    assertThrows[IllegalArgumentException] {
      EventAnalytics.rollingDistinct(e, "user_id", "ts", 0)
    }
  }
}
