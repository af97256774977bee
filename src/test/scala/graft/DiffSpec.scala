package graft

import graft.ops.Diff

/** Snapshot diff (q114's operator): null-safe compare semantics and
  * composite keys — the cases the orders-derived gate fixture can't hit.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("null transitions: null→value changed, null→null unchanged") {
    val v1 = Seq((1L, Option.empty[String], "a"), (2L, Option.empty[String], "b"),
      (3L, Option("x"), "c")).toDF("id", "note", "tag")
    val v2 = Seq((1L, Option("now-set"), "a"), (2L, Option.empty[String], "b"),
      (3L, Option.empty[String], "c")).toDF("id", "note", "tag")
    val got = Diff.snapshotDiff(v1, v2, Seq("id"), Seq("note", "tag"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "changed", "note"),
      (2L, "unchanged", ""),
      (3L, "changed", "note")))
  }

  test("composite key + changed_cols preserves caller column order") {
    val v1 = Seq(("s1", 1L, 10.0, "A"), ("s1", 2L, 20.0, "B"))
      .toDF("site", "id", "price", "grade")
    val v2 = Seq(("s1", 1L, 11.0, "Z"), ("s2", 2L, 20.0, "B"))
      .toDF("site", "id", "price", "grade")
    val got = Diff.snapshotDiff(v1, v2, Seq("site", "id"), Seq("price", "grade"))
      .as[(String, Long, String, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("s1", 1L, "changed", "price,grade"),
      ("s1", 2L, "removed", ""),
      ("s2", 2L, "added", "")))
  }

  test("applyChanges: highest seq wins, D removes, I inserts, rest pass through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e"))
      .toDF("id", "v")
    val changes = Seq(
      (2L, 1L, "U", "b2"), (2L, 2L, "D", null),      // update superseded by delete
      (3L, 1L, "U", "c2"),                           // plain update
      (4L, 1L, "I", "d"),                            // insert of a new key
      (5L, 1L, "D", null), (5L, 2L, "U", "e2"))      // delete superseded by update
      .toDF("id", "seq", "op", "v")
    val got = Diff.applyChanges(base, changes, Seq("id"), Seq("v"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (3L, "c2"), (4L, "d"), (5L, "e2")))
  }

  test("applyChanges: D on an absent key is a no-op, composite payload upserts whole row") {
    val base = Seq((1L, "a", 10.0)).toDF("id", "v", "w")
    val changes = Seq(
      (9L, 1L, "D", Option.empty[String], Option.empty[Double]),
      (1L, 1L, "U", Option("a2"), Option(11.0)))
      .toDF("id", "seq", "op", "v", "w")
    val got = Diff.applyChanges(base, changes, Seq("id"), Seq("v", "w"))
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a2", 11.0)))
  }

  test("applyChanges: a tie at the max seq raises instead of picking an " +
    "arbitrary winner; ties below the max stay harmless") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val tiedAtMax = Seq((1L, 2L, "U", "x"), (1L, 2L, "U", "y"))
      .toDF("id", "seq", "op", "v")
    val ex = intercept[Exception] {
      Diff.applyChanges(base, tiedAtMax, Seq("id"), Seq("v")).collect()
    }
    assert(ex.getMessage.contains("applyChanges") ||
      Option(ex.getCause).exists(_.getMessage.contains("applyChanges")))
    // duplicate seq BELOW the max has a defined winner — must not raise
    val tiedBelow = Seq((1L, 1L, "U", "x"), (1L, 1L, "U", "y"),
      (1L, 2L, "U", "z")).toDF("id", "seq", "op", "v")
    val got = Diff.applyChanges(base, tiedBelow, Seq("id"), Seq("v"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "z")))
  }

  test("incrementalAgg: an unknown op raises instead of silently " +
    "counting as an insert") {
    val base = Diff.aggregateCents(
      Seq(("a", 1.00)).toDF("k", "value"), Seq("k"), "value")
    val delta = Seq(("a", "U", 2.00)).toDF("k", "op", "value")
    val ex = intercept[Exception] {
      Diff.incrementalAgg(base, delta, Seq("k"), "value").collect()
    }
    assert(ex.getMessage.contains("incrementalAgg") ||
      Option(ex.getCause).exists(_.getMessage.contains("incrementalAgg")))
  }

  test("incrementalAgg: folds inserts+deletes, drops zeroed keys, adds new ones") {
    val baseRows = Seq(("a", 1.00), ("a", 2.00), ("b", 3.00))
      .toDF("k", "value")
    val base = Diff.aggregateCents(baseRows, Seq("k"), "value")
    val delta = Seq(
      ("a", "I", 4.00),  // insert
      ("a", "D", 1.00),  // delete one of a's rows
      ("b", "D", 3.00),  // b's count reaches zero → key leaves
      ("c", "I", 5.00))  // brand-new key
      .toDF("k", "op", "value")
    val got = Diff.incrementalAgg(base, delta, Seq("k"), "value")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 2L, 600L), ("c", 1L, 500L)))
    // incremental ≡ recompute over the effective row set
    val effective = Seq(("a", 2.00), ("a", 4.00), ("c", 5.00))
      .toDF("k", "value")
    val full = Diff.aggregateCents(effective, Seq("k"), "value")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == full)
  }

  test("incrementalMinMax: insert-only keys merge WITHOUT rescan; a delete " +
    "of the current min recovers the runner-up; duplicates survive one " +
    "delete; fully-deleted keys leave") {
    val baseRows = Seq(
      ("a", 1.00), ("a", 5.00),            // a: delete-free → cheap path
      ("b", 2.00), ("b", 2.00), ("b", 9.00), // b: min 2.00 twice
      ("c", 7.00))                          // c: all rows deleted
      .toDF("k", "value")
    val baseAgg = Diff.minMaxCents(baseRows, Seq("k"), "value")
    val delta = Seq(
      ("a", "I", 0.50),   // new min for a, merge path
      ("b", "D", 2.00),   // one of b's two 2.00s — min must SURVIVE
      ("b", "D", 9.00),   // b's max — runner-up (the other 2.00) takes over
      ("c", "D", 7.00),   // c leaves the relation
      ("d", "I", 3.00))   // brand-new key, merge path
      .toDF("k", "op", "value")
    val got = Diff.incrementalMinMax(baseRows, baseAgg, delta,
      Seq("k"), "value")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 50L, 500L, false),
      ("b", 200L, 200L, true),
      ("d", 300L, 300L, false)))
    // incremental ≡ recompute over the effective row set
    val effective = Seq(("a", 0.50), ("a", 1.00), ("a", 5.00),
      ("b", 2.00), ("d", 3.00)).toDF("k", "value")
    val full = Diff.minMaxCents(effective, Seq("k"), "value")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == full)
  }

  test("incrementalMinMax: a delete with no surviving occurrence raises; " +
    "so does an unknown op") {
    val baseRows = Seq(("a", 1.00)).toDF("k", "value")
    val baseAgg = Diff.minMaxCents(baseRows, Seq("k"), "value")
    val phantom = Seq(("a", "D", 9.99)).toDF("k", "op", "value")
    val e1 = intercept[Exception] {
      Diff.incrementalMinMax(baseRows, baseAgg, phantom, Seq("k"), "value")
        .collect()
    }
    assert(e1.getMessage.contains("no surviving occurrence") ||
      Option(e1.getCause).exists(_.getMessage.contains("no surviving occurrence")))
    val badOp = Seq(("a", "U", 1.00)).toDF("k", "op", "value")
    val e2 = intercept[Exception] {
      Diff.incrementalMinMax(baseRows, baseAgg, badOp, Seq("k"), "value")
        .collect()
    }
    assert(e2.getMessage.contains("op must be") ||
      Option(e2.getCause).exists(_.getMessage.contains("op must be")))
  }
}
