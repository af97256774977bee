package graft.ledger

import org.apache.spark.sql.DataFrame

/** The ledger contract every storage strategy implements — the reference's
  * MongoDB collection operations (db.py:66-231) as a storage-neutral
  * interface:
  *
  *  - [[init]]/[[append]]: insert-only ingest (append dedups by hash);
  *  - [[mergeNoOverride]]: enrich matched rows, existing values win
  *    (db.py:99,105-106,115,120-121 / tests/hooks/test_db.py:16-47);
  *  - [[markUploaded]]: the one terminal flag flip (db.py:189-196);
  *  - no delete: quarantined in the reference (db.py:127-133), absent here.
  *
  * Strategies: [[Ledger]] (hash-prefix-partitioned Parquet, the offline
  * default), [[BucketedLedger]] (catalog-bucketed table — the merge join
  * runs with NO shuffle on the ledger side), [[MongoLedger]] (the
  * reference's actual store, usable when the Mongo Spark connector jar is
  * on the classpath).
  */
trait LedgerStore {
  def exists: Boolean
  def read(): DataFrame
  def init(records: DataFrame): Unit
  def append(records: DataFrame): Unit
  def mergeNoOverride(updates: DataFrame,
                      fields: Seq[String] = LedgerStore.enrichable): Unit
  def markUploaded(dmpIds: DataFrame): Unit
}

object LedgerStore {
  /** The columns a merge may fill — everything else is identity or terminal
    * state (is_uploaded goes through markUploaded only).
    */
  val enrichable: Seq[String] =
    Seq("device_serial", "device_id", "patient_id", "dmp_dataset", "dmp_id")
}
