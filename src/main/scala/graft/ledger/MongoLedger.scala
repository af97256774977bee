package graft.ledger

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter,
  Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ledger strategy on the reference's ACTUAL store — a MongoDB collection
  * (ideafast_etl/hooks/db.py:11) — through the MongoDB Spark connector's
  * public `mongodb` source. This closes the drop-in-replacement gap: a
  * reference deployment keeps its Mongo records collection and swaps only
  * the compute.
  *
  * The connector jar is NOT in the offline sandbox, so construction is
  * cheap and nothing touches the format until an operation runs; the
  * round-trip spec gates on `GRAFT_MONGO_URI` and cancels when absent.
  * Option names are the connector's documented v10 surface
  * (`connection.uri` / `database` / `collection`, and for writes
  * `idFieldList` + `operationType` + `upsertDocument`).
  *
  * Semantics map 1:1 onto db.py:
  *  - [[append]]: anti-join dedup then insert (db.py:76-86);
  *  - [[mergeNoOverride]]: compute the no-override coalesce IN SPARK on
  *    just the matched rows, then replace-upsert keyed on `hash` — the
  *    whole-document update db.py does per record, batched;
  *  - [[markUploaded]]: same replace-upsert for the flag flip.
  *
  * Scale note: Mongo is the reference's operational metadata store, not a
  * 100 TB analytics substrate — the connector pushes filters/projections
  * down and partitions reads by `_id` ranges, which is the right shape for
  * the ledger's metadata volume; the bulk data itself lives in object
  * storage either way.
  */
final class MongoLedger(spark: SparkSession, uri: String,
                        database: String, collection: String)
    extends LedgerStore {

  private val enrichable = LedgerStore.enrichable

  private def reader: DataFrameReader =
    spark.read.format("mongodb")
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)

  private def writer(df: DataFrame): DataFrameWriter[Row] =
    df.write.format("mongodb")
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)
      .option("idFieldList", "hash")

  /** An absent collection reads as an empty frame; any connector/transport
    * failure surfaces as non-existence only for the `exists` probe.
    */
  def exists: Boolean =
    try !reader.load().isEmpty
    catch { case _: Exception => false }

  def read(): DataFrame = reader.load().drop("_id")

  def init(records: DataFrame): Unit =
    writer(records).mode(SaveMode.Overwrite).save()

  def append(records: DataFrame): Unit = {
    val fresh = records.join(read().select("hash"), Seq("hash"), "left_anti")
    writer(fresh).option("operationType", "insert")
      .mode(SaveMode.Append).save()
  }

  def mergeNoOverride(updates: DataFrame,
                      fields: Seq[String] = enrichable): Unit = {
    require(fields.forall(enrichable.contains),
      s"only $enrichable are enrichable; is_uploaded goes via markUploaded")
    val upd = updates
      .select(col("hash") +: fields.map(f => col(f).as(s"_u_$f")): _*)
    // inner join: only matched documents rewrite (db.py updates by id);
    // existing values win via coalesce, exactly the no-override contract
    val merged = fields.foldLeft(
        read().join(upd, Seq("hash"))) { (df, f) =>
        df.withColumn(f, coalesce(col(f), col(s"_u_$f")))
      }.drop(fields.map(f => s"_u_$f"): _*)
    writer(merged).option("operationType", "replace")
      .option("upsertDocument", "true")
      .mode(SaveMode.Append).save()
  }

  def markUploaded(dmpIds: DataFrame): Unit = {
    val ids = broadcast(dmpIds.select(col("dmp_id").as("_u_dmp_id")).distinct())
    val flagged = read()
      .join(ids, col("dmp_id") === col("_u_dmp_id"), "left_semi")
      .withColumn("is_uploaded", lit(true))
    writer(flagged).option("operationType", "replace")
      .option("upsertDocument", "true")
      .mode(SaveMode.Append).save()
  }
}
