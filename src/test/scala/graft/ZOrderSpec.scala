package graft

import org.apache.spark.sql.functions._

import graft.expressions.{InterleaveBits, ZOrderUtil}
import graft.ops.Output

/** Morton-curve kernel + Z-order bucket layout — engine-local properties;
  * cross-engine bit parity is oracle-gated (q131).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns") {
    // x=0b11 at even positions (1|4), y=0b01 at odd (2) -> 0b0111
    assert(ZOrderUtil.interleave(3L, 1L, 2) == 7L)
    // x=0b10 -> 4, y=0b11 -> 2|8 -> 14
    assert(ZOrderUtil.interleave(2L, 3L, 2) == 14L)
    assert(ZOrderUtil.interleave(0L, 0L, 16) == 0L)
    // full 16-bit corners: (65535, 65535) -> all 32 low bits set
    assert(ZOrderUtil.interleave(65535L, 65535L, 16) == 0xFFFFFFFFL)
  }

  test("column expression and SQL registration agree with the static kernel") {
    val viaCol = Seq((3L, 1L)).toDF("x", "y")
      .select(InterleaveBits(col("x"), col("y"), 2)).head().getLong(0)
    assert(viaCol == 7L)
    assert(spark.sql("SELECT graft_interleave_bits(3, 1, 2)").head().getLong(0) == 7L)
    assert(spark.sql("SELECT graft_interleave_bits(65535, 65535)").head()
      .getLong(0) == 0xFFFFFFFFL)
  }

  test("zorderBuckets: every bucket footprint is tight in BOTH dimensions") {
    // a full 64x64 grid: with 16 buckets each must cover exactly 1/4 of
    // each dimension's range (the property single-column sorting cannot
    // give — its second dimension spans the whole domain in every bucket)
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y))
      .toDF("x", "y")
    val stats = Output.zorderBuckets(grid, "x", "y", bits = 16, nBuckets = 16)
      .groupBy("zbucket").agg(
        count(lit(1)).as("n"),
        (max($"x") - min($"x")).as("xspan"),
        (max($"y") - min($"y")).as("yspan"))
      .collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n") == 256, s"even cell load: $r")
      assert(r.getAs[Int]("xspan") == 15, s"x footprint must be 1/4: $r")
      assert(r.getAs[Int]("yspan") == 15, s"y footprint must be 1/4: $r")
    }
  }

  test("degenerate dimension (min == max) quantizes to 0, not NaN") {
    val df = Seq((1, 7), (2, 7), (3, 7)).toDF("x", "y")
    val out = Output.zorderBuckets(df, "x", "y", bits = 16, nBuckets = 4)
      .select("zbucket").as[Long].collect().toSet
    assert(out.nonEmpty && out.forall(b => b >= 0 && b < 4))
  }

  test("hilbert: bijection over the grid and UNIT-STEP continuity — the " +
    "property Morton lacks") {
    import graft.expressions.HilbertUtil
    val bits = 3
    val n = 1 << bits // 8x8 grid
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertUtil.index(x.toLong, y.toLong, bits), (x, y))
    // bijection: every d in [0, 64) exactly once
    assert(cells.map(_._1).sorted == (0L until 64L))
    // continuity: consecutive curve positions are Manhattan-adjacent
    val byD = cells.sortBy(_._1).map(_._2)
    for (Seq((x1, y1), (x2, y2)) <- byD.sliding(2)) {
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // first cell of the canonical orientation is the origin
    assert(HilbertUtil.index(0L, 0L, bits) == 0L)
    // Morton, for contrast, jumps: d=3→4 crosses the quadrant seam
    val mByD = (for (x <- 0 until n; y <- 0 until n)
      yield (ZOrderUtil.interleave(x.toLong, y.toLong, bits), (x, y)))
      .sortBy(_._1).map(_._2)
    val jumps = mByD.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) =>
        math.abs(x1 - x2) + math.abs(y1 - y2) > 1
      case _ => false
    }
    assert(jumps > 0)
  }

  test("layoutFootprint: a single-column layout is blind on the other " +
    "dim; a curve layout splits the loss") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    // range-on-x with 4 buckets: x footprint 1/4, y footprint FULL
    val ranged = grid.withColumn("bucket", col("x") / 16 cast "long")
    val r = Output.layoutFootprint(ranged, "bucket", "x", "y", "range")
      .select("n_buckets", "x_footprint_ppm", "y_footprint_ppm")
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 250000L, 1000000L)))
    val zb = Output.zorderBuckets(grid, "x", "y", bits = 6, nBuckets = 4)
    val z = Output.layoutFootprint(zb, "zbucket", "x", "y", "zorder")
      .select("x_footprint_ppm", "y_footprint_ppm")
      .as[(Long, Long)].head()
    // 4 buckets = 1 x-bit + 1 y-bit → half the domain on EACH dim
    assert(z == ((500000L, 500000L)))
  }

  test("hilbert column expression matches the static kernel; buckets " +
    "bounded") {
    import graft.expressions.HilbertIndex
    val viaCol = Seq((5L, 6L)).toDF("x", "y")
      .select(HilbertIndex(col("x"), col("y"), 3)).head().getLong(0)
    assert(viaCol == graft.expressions.HilbertUtil.index(5L, 6L, 3))
    val pts = Seq((1, 7), (2, 7), (3, 7), (60, 60)).toDF("x", "y")
    val out = Output.hilbertBuckets(pts, "x", "y", bits = 16, nBuckets = 4)
      .select("hbucket").as[Long].collect().toSet
    assert(out.nonEmpty && out.forall(b => b >= 0 && b < 4))
  }
}
