package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located joins via bucketed tables: both sides pre-hashed into the
  * same bucket layout on the join key, so the join needs NO shuffle at
  * read time — the pattern that turns a repeated 100 TB join (e.g. ledger ⋈
  * enrichments every pipeline run) from a per-run shuffle into a one-time
  * write cost.
  *
  * Parquet bucketing requires the session catalog (`saveAsTable`); plain
  * `.parquet(path)` writes cannot record bucket metadata.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCols: Seq[String]): Unit =
    df.write
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching bucket
    * counts Spark plans a SortMergeJoin with NO Exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keyCols: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCols, joinType)
}
