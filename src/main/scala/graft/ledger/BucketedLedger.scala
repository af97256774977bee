package graft.ledger

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Bucketed

/** Ledger strategy on a catalog-bucketed table ([[graft.ops.Bucketed]]
  * wired into the merge hot path): the table is hash-bucketed AND
  * hash-sorted, so the merge join's ledger side is a bare bucketed scan —
  * NO Exchange, NO Sort. Updates are staged through [[Bucketed.coLocate]]
  * into a same-bucket-count temp table, so the JOIN plan contains zero
  * Exchange operators on either side (pinned by LedgerSpec); the one
  * shuffle of the (small) updates side happens at staging-write time,
  * never against the big table. At 100 TB that is the difference between
  * "merge = shuffle the whole ledger" and "merge = stream bucket-aligned
  * files".
  *
  * Writes are copy-on-write: the merged state lands in a fresh `__next`
  * table which is swapped in with DROP + ALTER TABLE RENAME (the same
  * rewrite a Delta/Iceberg MERGE does under the hood, with the swap
  * window narrowed to two catalog ops). Bucketing metadata lives in the
  * session catalog — with the offline in-memory catalog the bucket spec
  * (not the data) is session-scoped; production backs this with a
  * metastore, which also makes the swap a real transaction. The Parquet
  * [[Ledger]] stays the offline default; this strategy is the
  * scale-demonstration path (`--ledger-format bucketed`).
  */
final class BucketedLedger(spark: SparkSession, name: String,
                           buckets: Int = 32) extends LedgerStore {
  require(buckets > 0, s"buckets must be positive, got $buckets")
  require(name.matches("[A-Za-z0-9_]+"),
    s"table name must be a bare identifier, got '$name'")

  private val enrichable = LedgerStore.enrichable
  private def updTable = s"${name}__upd"
  private def nextTable = s"${name}__next"

  def exists: Boolean = spark.catalog.tableExists(name)

  def read(): DataFrame = spark.table(name)

  def init(records: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    Bucketed.coLocate(records, name, "hash", buckets)
  }

  /** Insert-only dedup append. The anti-join probes the bucketed scan
    * (ledger side exchange-free); fresh rows append as new bucket files
    * with the SAME spec, so the bucket layout survives appends.
    */
  def append(records: DataFrame): Unit = {
    val fresh = records.join(read().select("hash"), Seq("hash"), "left_anti")
    fresh.repartition(buckets, col("hash"))
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "hash").sortBy("hash")
      .saveAsTable(name)
  }

  /** The merge JOIN with both sides co-located — exposed separately so the
    * exchange-free property is assertable on the exact plan the merge
    * writes (LedgerSpec pins zero Exchange in this plan). Stages `updates`
    * into the co-located temp table as a side effect.
    */
  def mergePlan(updates: DataFrame,
                fields: Seq[String] = enrichable): DataFrame = {
    require(fields.forall(enrichable.contains),
      s"only $enrichable are enrichable; is_uploaded goes via markUploaded")
    Bucketed.coLocate(
      updates.select(col("hash") +: fields.map(f => col(f).as(s"_u_$f")): _*),
      updTable, "hash", buckets)
    val merged = read().join(spark.table(updTable), Seq("hash"), "left")
    fields.foldLeft(merged) { (df, f) =>
      df.withColumn(f, coalesce(col(f), col(s"_u_$f")))
    }.drop(fields.map(f => s"_u_$f"): _*)
  }

  def mergeNoOverride(updates: DataFrame,
                      fields: Seq[String] = enrichable): Unit =
    publish(mergePlan(updates, fields))

  /** Terminal flag flip; the id list is model-sized and broadcasts, so the
    * ledger side again joins without an Exchange.
    */
  def markUploaded(dmpIds: DataFrame): Unit = {
    val ids = broadcast(dmpIds.select(col("dmp_id").as("_u_dmp_id")).distinct())
    publish(read()
      .join(ids, col("dmp_id") === col("_u_dmp_id"), "left")
      .withColumn("is_uploaded",
        col("is_uploaded") || col("_u_dmp_id").isNotNull)
      .drop("_u_dmp_id"))
  }

  /** Copy-on-write swap: materialize to `__next` (bucketed, same spec),
    * then DROP old + RENAME next into place. Writing first means a failure
    * before the swap leaves the live table untouched.
    */
  private def publish(merged: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $nextTable")
    // `merged` already carries HashPartitioning(hash, buckets) from the
    // bucketed-scan join, so write WITHOUT the coLocate repartition — the
    // CoW rewrite streams bucket-aligned rows straight to bucket files
    // (I/O cost only; the full table never re-shuffles)
    merged.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "hash").sortBy("hash").saveAsTable(nextTable)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"ALTER TABLE $nextTable RENAME TO $name")
    spark.sql(s"DROP TABLE IF EXISTS $updTable")
  }
}
