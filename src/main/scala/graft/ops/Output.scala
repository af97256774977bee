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
}
