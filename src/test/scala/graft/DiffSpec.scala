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
}
