package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data emission: the write side of the pipeline, shaped for a
  * consumer that streams shards sequentially (a data loader), not for ad-hoc
  * query — the counterpart of the reference's upload sink for the
  * train-corpus use case.
  *
  * Properties the loader cares about, and how they map to Spark:
  *  - globally range-sharded: `repartitionByRange(shards, keys)` gives
  *    non-overlapping key ranges per shard (shard N's keys all precede
  *    shard N+1's) — sequential consumption preserves global order;
  *  - sorted within each shard: `sortWithinPartitions` — no global sort,
  *    the sort is partition-local after the range exchange;
  *  - bounded file sizes: `maxRecordsPerFile` caps each parquet file, so
  *    one giant shard degrades into several well-sized files instead of
  *    one unsplittable blob.
  * One exchange total; nothing on the driver.
  */
object Output {

  def writeSharded(df: DataFrame, path: String, shards: Int,
                   sortCols: Seq[String],
                   maxRecordsPerFile: Long = 1000000L): Unit = {
    require(sortCols.nonEmpty, "writeSharded needs at least one sort column")
    val keys: Seq[Column] = sortCols.map(col)
    df.repartitionByRange(shards, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Deterministic twin of `repartitionByRange`'s sampled boundaries:
    * integer-width ranges over [min(key), max(key)], all BIGINT math, so
    * the shard of a row is a pure function of the dataset — reproducible
    * across runs AND engines (the property the sampled path cannot give,
    * and what lets an oracle gate the manifest). Equal-width, not
    * equal-count: under heavy key skew prefer the sampled writer; for
    * manifest-auditable output this is the path.
    *
    * One tiny aggregate (min/max) broadcast back over the data — no
    * extra shuffle on the big side; the assignment is row-local.
    */
  def rangeShardAssign(df: DataFrame, keyCol: String, shards: Int,
                       shardCol: String = "shard_id"): DataFrame = {
    require(shards > 0, "rangeShardAssign needs shards > 0")
    val stats = df.agg(min(col(keyCol)).as("__lo"), max(col(keyCol)).as("__hi"))
    // DECIMAL(38,0) math: (key - lo) * shards wraps in long arithmetic for
    // snowflake-width key ranges (> Long.MAX/shards) and would corrupt
    // shard ids silently; decimal keeps it exact and matches the oracle's
    // HUGEINT. `div` on decimals yields the integral quotient (a long —
    // the quotient is < shards by construction). The key identifier is
    // backtick-quoted so non-plain column names parse as one reference.
    val q = "`" + keyCol.replace("`", "``") + "`"
    val bounded = expr(
      s"CAST(least(${shards - 1}, ((CAST($q AS DECIMAL(38,0)) - __lo) * $shards)" +
        s" div (CAST(__hi AS DECIMAL(38,0)) - __lo + 1)) AS BIGINT)")
    df.crossJoin(broadcast(stats))
      // a null key surfaces as a null shard id (least() would otherwise
      // swallow the null and route the row to the top shard, invisible in
      // that shard's manifest range) — same discipline as Sampling's q53
      .withColumn(shardCol,
        when(col(keyCol).isNull, lit(null).cast("long")).otherwise(bounded))
      .drop("__lo", "__hi")
  }

  /** Shard manifest: what a loader checks before consuming — per-shard row
    * count and key range (non-overlapping, ordered by construction). */
  def shardManifest(assigned: DataFrame, keyCol: String,
                    shardCol: String = "shard_id"): DataFrame =
    assigned.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
      .orderBy(col(shardCol))

  /** Write pre-assigned shards as a partitioned layout (`shard_id=N/`
    * directories), sorted within each shard — the deterministic-manifest
    * variant of [[writeSharded]]. One exchange on the shard id. */
  def writeShardedBy(assigned: DataFrame, path: String,
                     sortCols: Seq[String],
                     shardCol: String = "shard_id",
                     maxRecordsPerFile: Long = 1000000L): Unit = {
    require(sortCols.nonEmpty, "writeShardedBy needs at least one sort column")
    // the shard column LEADS the within-partition sort: the V1 write path
    // requires ordering by partitionBy columns and would otherwise stack
    // its own Sort(shard_id) on top of this one — correct only via sort
    // stability, which the spill-merge path does NOT provide, silently
    // breaking the documented sorted-within-shard invariant under memory
    // pressure (and paying a redundant whole-task sort even without it)
    assigned.repartition(col(shardCol))
      .sortWithinPartitions((col(shardCol) +: sortCols.map(col)): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(shardCol)
      .mode("overwrite")
      .parquet(path)
  }

  /** Z-order (Morton-curve) bucket assignment over two dimensions — the
    * multi-dimensional clustering a 100 TB table needs for file skipping on
    * MORE THAN ONE filter column: sorting by x alone leaves y's min/max
    * footer spanning the whole domain in every file, while the interleaved
    * curve tightens BOTH (each of 2^b buckets covers ~2^-⌈b/2⌉ of each
    * dimension's range — the q131 gate measures exactly that). Delta and
    * Iceberg ship this as a table service; here it is plain Spark:
    * quantize each dim to a `bits`-bit grid (min/max ride a broadcast
    * one-row relation — no driver collect), interleave with the native
    * [[graft.expressions.InterleaveBits]] codegen kernel, and take the top
    * log2(nBuckets) curve bits as the bucket. Compose with
    * [[writeShardedBy]](shardCol = "zbucket") to materialize the layout;
    * everything is deterministic integer/IEEE-double math, so the
    * assignment is reproducible across runs AND engines.
    */
  def zorderBuckets(df: DataFrame, xCol: String, yCol: String,
                    bits: Int = 16, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val log2n = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    require(log2n <= 2 * bits, s"nBuckets=$nBuckets exceeds 2^(2*$bits) cells")
    val scale = (1L << bits) - 1
    val mm = broadcast(df.agg(
      min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax")))
    def quant(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast("double") - lo) / (hi - lo) * scale).cast("long"))
    df.crossJoin(mm)
      .withColumn("__qx", quant(col(xCol), col("__xmin"), col("__xmax")))
      .withColumn("__qy", quant(col(yCol), col("__ymin"), col("__ymax")))
      .withColumn("zval", graft.expressions.InterleaveBits(
        col("__qx"), col("__qy"), bits))
      .withColumn("zbucket", shiftright(col("zval"), 2 * bits - log2n))
      .drop("__xmin", "__xmax", "__ymin", "__ymax", "__qx", "__qy")
  }

  /** Hilbert-curve clustering — [[zorderBuckets]]'s better-locality
    * sibling (same quantization contract, same writer composition):
    * every unit step along the Hilbert curve is a unit step in the grid,
    * so a curve-range bucket is a CONTIGUOUS rectangle-ish region and
    * both dims' min/max footers tighten beyond Z-order's quadrant jumps.
    * Z is cheaper per row (pure interleave); H clusters better — ship
    * both, pick per table (the Delta/Iceberg OPTIMIZE menu, as plain
    * Spark expressions).
    */
  def hilbertBuckets(df: DataFrame, xCol: String, yCol: String,
                     bits: Int = 16, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two, got $nBuckets")
    val log2n = java.lang.Integer.numberOfTrailingZeros(nBuckets)
    require(log2n <= 2 * bits, s"nBuckets=$nBuckets exceeds 2^(2*$bits) cells")
    val scale = (1L << bits) - 1
    val mm = broadcast(df.agg(
      min(col(xCol)).as("__xmin"), max(col(xCol)).as("__xmax"),
      min(col(yCol)).as("__ymin"), max(col(yCol)).as("__ymax")))
    def quant(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        floor((c.cast("double") - lo) / (hi - lo) * scale).cast("long"))
    df.crossJoin(mm)
      .withColumn("__qx", quant(col(xCol), col("__xmin"), col("__xmax")))
      .withColumn("__qy", quant(col(yCol), col("__ymin"), col("__ymax")))
      .withColumn("hval", graft.expressions.HilbertIndex(
        col("__qx"), col("__qy"), bits))
      .withColumn("hbucket", shiftright(col("hval"), 2 * bits - log2n))
      .drop("__xmin", "__xmax", "__ymin", "__ymax", "__qx", "__qy")
  }

  /** Footprint metric for a bucketed layout — the file-skipping audit
    * that closes the layout family the way the recall audits close ANN:
    * per bucket the (x, y) bounding-box area, rolled up to
    * footprint_ppm = 10⁶·Σ area / (buckets · total area) — the expected
    * fraction of the key space a bucket's min/max footer admits. Lower =
    * tighter footers = more row groups skipped by a 2-D predicate.
    * A single-column sort reads ~10⁶/buckets on its own dim but ~10⁶ on
    * the other; space-filling curves trade a little of x for a lot of y
    * (and Hilbert beats Morton — its curve ranges are contiguous).
    * Exact integers end to end; one aggregate over the bucketed relation
    * plus a one-row total.
    */
  def layoutFootprint(df: DataFrame, bucketCol: String, xCol: String,
                      yCol: String, layout: String): DataFrame = {
    val per = df.groupBy(col(bucketCol))
      .agg((max(col(xCol)) - min(col(xCol)) + 1L).as("_bxs"),
        (max(col(yCol)) - min(col(yCol)) + 1L).as("_bys"))
    val tot = df.agg(
      (max(col(xCol)) - min(col(xCol)) + 1L).as("_xs"),
      (max(col(yCol)) - min(col(yCol)) + 1L).as("_ys"))
    // Per-DIMENSION footprints are the discriminating numbers: a point/
    // range predicate on x touches a bucket iff the bucket's x footer
    // admits it, so the expected touched fraction is the mean bucket
    // x-span over the domain — and likewise for y. A single-column sort
    // reads ~10⁶/buckets on its own dim and ~10⁶ on the blind one; the
    // curves split the loss. The joint area is a sanity column: on
    // uniform data every space-tiling layout reads 10⁶/buckets there
    // (equal tilings are indistinguishable by area — only the per-dim
    // SHAPE of the tiles differs).
    per.agg(count(lit(1)).as("n_buckets"),
        sum(col("_bxs").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("_sx"),
        sum(col("_bys").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("_sy"),
        sum(expr("CAST(_bxs AS DECIMAL(38,0)) * _bys")).as("_area"))
      .crossJoin(broadcast(tot))
      .select(lit(layout).as("layout"), col("n_buckets"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * _sx) div " +
          "(CAST(n_buckets AS DECIMAL(38,0)) * _xs) AS BIGINT)")
          .as("x_footprint_ppm"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * _sy) div " +
          "(CAST(n_buckets AS DECIMAL(38,0)) * _ys) AS BIGINT)")
          .as("y_footprint_ppm"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * _area) div " +
          "(CAST(n_buckets AS DECIMAL(38,0)) * _xs * _ys) AS BIGINT)")
          .as("area_ppm"))
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partitionCols` (`col=value/...`), the physical contract that lets a
    * reader with a predicate on those columns SKIP whole directories —
    * partition pruning, the single biggest scan reducer at 100 TB (a
    * day/source predicate over a year of data touches 1/365 of the
    * files, before any row is read). Choose LOW-cardinality, always-
    * filtered columns; a high-cardinality partition key degrades into
    * millions of tiny files (that case wants [[zorderBuckets]] /
    * [[writeSharded]] instead — documented, not guessed).
    */
  def writeHivePartitioned(df: DataFrame, path: String,
                           partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "partitionCols must be non-empty")
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-placement rule a 100 TB corpus wants when the shard count
    * will CHANGE over its lifetime: growing N→N+1 moves only ~1/(N+1) of
    * keys (vs ~(N)/(N+1) for `hash(key) % N`), so an incremental
    * re-shard touches one new shard's worth of data, not the whole lake.
    *
    * Entirely ROW-LOCAL: each row scores every shard with the
    * engine-portable [[graft.functions.TextFns.hash64]] of `key:shard`
    * and takes the arg-max — one `transform` over a literal shard
    * sequence, no explode, no shuffle, no driver state. The 60-bit
    * sha256-prefix scores make ties a hash collision (never observed;
    * both engines would then disagree only on collided keys), and make
    * the assignment bit-reproducible in the DuckDB oracle
    * (`arg_max(shard, score)` over `generate_series`). Compose with
    * [[writeShardedBy]] to materialize.
    */
  def rendezvousAssign(df: DataFrame, keyCol: String, shards: Int,
                       outCol: String = "shard_id"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val scores = hrwScores(col(keyCol), shards)
    df.withColumn("__hrw", scores)
      .withColumn(outCol,
        (array_position(col("__hrw"), array_max(col("__hrw"))) - 1)
          .cast("int"))
      .drop("__hrw")
  }

  /** One score per shard id 0..shards-1: hash64(key ++ ":" ++ shard). */
  private def hrwScores(key: Column, shards: Int): Column =
    transform(sequence(lit(0), lit(shards - 1)),
      s => graft.functions.TextFns.hash64(
        concat(key.cast("string"), lit(":"), s.cast("string"))))

  /** Rebalance audit for [[rendezvousAssign]]: how many keys move when the
    * shard count changes `shardsBefore` → `shardsAfter`? Because rendezvous
    * scores are per-(key, shard) and independent of N, both assignments
    * come from ONE score array (prefix slices of length N) — still
    * row-local; the only aggregate is the group-sized census at the end
    * (map-side combined). GROWING N→N+1 moves an expected 1/(N+1) of keys,
    * all TO the new shard (q242 pins 8→9 ≈ 111111 ppm against the DuckDB
    * oracle, which replays the same sha256 scores); SHRINKING moves
    * exactly the removed shards' keys, scattered over the survivors by
    * their next-best score. `moved_ppm` is exact integer arithmetic
    * (floor), no IEEE rounding.
    */
  def rendezvousMoveCensus(df: DataFrame, keyCol: String, groupCol: String,
                           shardsBefore: Int, shardsAfter: Int): DataFrame = {
    require(shardsBefore >= 1 && shardsAfter >= 1 &&
      shardsBefore != shardsAfter,
      s"need two distinct shard counts >= 1, got $shardsBefore/$shardsAfter")
    val scores = hrwScores(col(keyCol),
      math.max(shardsBefore, shardsAfter))
    def argmax(arr: Column): Column =
      (array_position(arr, array_max(arr)) - 1).cast("int")
    df.withColumn("__hrw", scores)
      .withColumn("__before", argmax(slice(col("__hrw"), 1, shardsBefore)))
      .withColumn("__after", argmax(slice(col("__hrw"), 1, shardsAfter)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum((col("__before") =!= col("__after")).cast("long")).as("n_moved"))
      .withColumn("moved_ppm",
        expr("CAST(1000000 * n_moved div n_keys AS BIGINT)"))
  }

  /** The SHRINK-direction audit of [[rendezvousMoveCensus]], with the
    * direction's defining contract reported IN-BAND: when the shard count
    * drops `shardsBefore` → `shardsAfter` (< before), the keys that move
    * are EXACTLY the keys whose winner was a removed shard
    * (id >= shardsAfter) — survivors keep their winner (its score didn't
    * change), and each orphaned key scatters to its next-best surviving
    * score. Emits per group: `n_keys`, `n_moved`, `n_from_removed`
    * (movers whose before-shard was removed) and
    * `moves_only_from_removed` = (n_moved = n_from_removed) — a gate
    * hash-verifies the equality as data, not as a code comment (q247
    * pins 9→8 against the DuckDB oracle; the PropertySpec law covers
    * arbitrary pairs). Same row-local prefix-slice scoring as the grow
    * census: one score array, zero key-side shuffle, group-sized census.
    */
  def rendezvousShrinkAudit(df: DataFrame, keyCol: String, groupCol: String,
                            shardsBefore: Int, shardsAfter: Int): DataFrame = {
    require(shardsAfter >= 1 && shardsAfter < shardsBefore,
      s"shrink audit needs shardsAfter < shardsBefore, " +
        s"got $shardsBefore -> $shardsAfter")
    val scores = hrwScores(col(keyCol), shardsBefore)
    def argmax(arr: Column): Column =
      (array_position(arr, array_max(arr)) - 1).cast("int")
    df.withColumn("__hrw", scores)
      .withColumn("__before", argmax(col("__hrw")))
      .withColumn("__after", argmax(slice(col("__hrw"), 1, shardsAfter)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_keys"),
        sum((col("__before") =!= col("__after")).cast("long"))
          .as("n_moved"),
        sum((col("__before") >= shardsAfter).cast("long"))
          .as("n_from_removed"))
      .withColumn("moves_only_from_removed",
        col("n_moved") === col("n_from_removed"))
      .withColumn("moved_ppm",
        expr("CAST(1000000 * n_moved div n_keys AS BIGINT)"))
  }

  /** Cumulative-size compaction grouping — the planner step of a
    * small-file compactor (Delta OPTIMIZE / Iceberg rewrite_data_files do
    * the same binning as a table service): within each partition, walk the
    * manifest in its stable order and cut a new group every `targetBytes`
    * of cumulative input. Group id = floor(preceding-bytes / target) — one
    * window over the MANIFEST (metadata-sized: ~800k rows for 100 TB of
    * 128 MB files), never over the data; exact integer division, so the
    * plan is reproducible across runs and engines (q243 oracle). Groups
    * can overshoot the target by at most one file — the standard greedy
    * contract; a group holding one over-target file is left alone rather
    * than split (compaction never rewrites a big-enough file). `bytesCol`
    * must be non-negative and non-null (a manifest invariant — window
    * `sum` would silently skip NULLs and negative sizes would walk the
    * cumulative sum backwards; garbage manifests yield garbage plans).
    */
  def compactionGroups(files: DataFrame, partCol: String, orderCol: String,
                       bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files
      .withColumn("__prev", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("compaction_group",
        expr(s"CAST(__prev div ${targetBytes}L AS BIGINT)"))
      .drop("__prev")
  }

  /** Read-back of [[writeHivePartitioned]]. The caller's filter on the
    * partition columns becomes `PartitionFilters` in the scan (pinned by
    * PlanIntegritySpec) — directories outside the predicate are never
    * opened. Partition values are TYPE-INFERRED from the hive path
    * encoding (numeric/date keys come back int/date, not string —
    * `spark.sql.sources.partitionColumnTypeInference.enabled` is on by
    * default); set that conf to false if raw strings are needed. */
  def readHivePartitioned(spark: org.apache.spark.sql.SparkSession,
                          path: String): DataFrame =
    spark.read.parquet(path)
}
