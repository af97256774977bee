package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables — the co-located-join technique the
  * 100 TB design brief calls for: persist both sides of a recurring join
  * hash-bucketed AND sorted by the join key, and every subsequent join
  * on that key reads bucket-aligned files with NO exchange and NO sort —
  * the two big-table join shuffles disappear from every downstream run.
  *
  * When it pays: a fact table joined repeatedly on the same key (the
  * ledger's hash, documents ⋈ embeddings on doc_id) where one write-time
  * shuffle amortizes over many read-time joins. When it doesn't: ad-hoc
  * keys, or sides small enough to broadcast (the planner's broadcast path
  * is already shuffle-free).
  *
  * Uses Spark's native bucketing (`DataFrameWriter.bucketBy` +
  * `saveAsTable`): the bucket spec lives in the catalog, and the planner
  * proves exchange-elimination when both sides' bucket counts match.
  * BucketedSpec pins the property — the co-located join's physical plan
  * contains zero Exchange operators.
  */
object Bucketed {

  /** Persist `df` as a bucketed+sorted catalog table. One shuffle now
    * (`repartition(buckets, key)` also aligns file count with bucket
    * count so each bucket is one file, not one per input partition),
    * zero join shuffles later.
    */
  def coLocate(df: DataFrame, table: String, key: String,
               buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Join two co-located tables on their shared bucket key. The plan is a
    * SortMergeJoin whose children are bare bucketed scans — no Exchange,
    * no Sort (bucket files are written key-sorted).
    */
  def joinCoLocated(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
