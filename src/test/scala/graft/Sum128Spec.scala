package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expressions.Sum128

/** Sum128 (two-long 128-bit accumulator) must be value-identical to the
  * built-in sum(CAST(x AS DECIMAL(38,0))) it replaces — including null
  * skipping, all-null/empty groups, sign handling, and carry propagation
  * across partition merges.
  */
class Sum128Spec extends SparkSpec {
  import spark.implicits._

  private def pin(xs: Seq[Option[Long]], parts: Int): Unit = {
    val df = xs.toDF("x").repartition(parts)
    val r = df.select(
      Sum128(col("x")).as("fast"),
      sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("spec")).collect().head
    assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
    if (!r.isNullAt(0))
      assert(r.getDecimal(0) == r.getDecimal(1), s"value mismatch: $r")
  }

  test("carry propagation: sums crossing the 2^63 boundary both ways") {
    pin(Seq(Some(Long.MaxValue), Some(Long.MaxValue), Some(1L)), 1)
    pin(Seq(Some(Long.MinValue), Some(Long.MinValue), Some(-1L)), 1)
    pin(Seq(Some(Long.MaxValue), Some(Long.MinValue)), 2)
    pin((1 to 64).map(_ => Some(Long.MaxValue)), 8)
    pin((1 to 64).map(_ => Some(Long.MinValue)), 8)
  }

  test("null skipping and empty groups match the decimal sum") {
    pin(Seq(None, None, None), 2)
    pin(Seq(None, Some(5L), None, Some(-7L)), 3)
    val empty = spark.emptyDataset[Long].toDF("x")
    val r = empty.select(Sum128(col("x")).as("f"),
      sum(col("x").cast("decimal(38,0)")).as("s")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("grouped: per-group sums with skewed group sizes") {
    val rows = (0 until 2000).map(i =>
      (i % 7, if (i % 11 == 0) None else Some((i.toLong - 1000) * (1L << 40))))
    val df = rows.toDF("g", "x").repartition(16)
    val bad = df.groupBy("g")
      .agg(Sum128(col("x")).as("fast"),
        sum(col("x").cast("decimal(38,0)")).as("spec"))
      .filter(not(col("fast") <=> col("spec"))).count()
    assert(bad == 0)
  }

  test("property: random longs incl. extremes across many partitions") {
    val gen = Gen.listOfN(3000, Gen.frequency(
      5 -> Gen.choose(Long.MinValue, Long.MaxValue).map(Option(_)),
      3 -> Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L, 1L).map(Option(_)),
      1 -> Gen.const(Option.empty[Long])))
    val xs = gen.apply(Gen.Parameters.default, Seed(7L)).get
    pin(xs, 32)
    // and grouped, so merge paths with uneven partial buffers are hit
    val df = xs.zipWithIndex.map { case (x, i) => (i % 13, x) }
      .toDF("g", "x").repartition(32)
    val bad = df.groupBy("g")
      .agg(Sum128(col("x")).as("fast"),
        sum(col("x").cast("decimal(38,0)")).as("spec"))
      .filter(not(col("fast") <=> col("spec"))).count()
    assert(bad == 0)
  }

  test("SQL surface: graft_sum128 via GraftExtensions") {
    val df = Seq(1L, 2L, 3L).toDF("x")
    df.createOrReplaceTempView("sum128_t")
    val v = spark.sql("SELECT graft_sum128(x) AS s FROM sum128_t")
      .collect().head.getDecimal(0)
    assert(v.longValueExact() == 6L)
  }
}
