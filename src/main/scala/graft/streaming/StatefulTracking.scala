package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `KeyValueGroupedDataset.mapGroupsWithState` —
  * the per-key state machine the reference keeps in its Mongo ledger rows
  * (SURVEY.md §1.2: "the record's null columns are a state machine"),
  * maintained incrementally across micro-batches instead of re-scanned.
  */
object StatefulTracking {

  /** Running per-device activity: total records seen and the latest event
    * time, accumulated across ALL batches sharing a checkpoint.
    */
  final case class DeviceActivity(device_id: String, n_records: Long,
                                  last_seen: Timestamp)

  /** One input record: (device_id, event time). */
  def trackDeviceActivity(spark: SparkSession,
                          records: Dataset[(String, Timestamp)]): Dataset[DeviceActivity] = {
    import spark.implicits._
    records
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (dev: String, rows: Iterator[(String, Timestamp)],
         state: GroupState[DeviceActivity]) =>
          val batch = rows.toSeq
          val prev = state.getOption.getOrElse(DeviceActivity(dev, 0L, null))
          val lastSeen = (Option(prev.last_seen) ++ batch.map(_._2))
            .maxBy(_.getTime)
          val next = DeviceActivity(dev, prev.n_records + batch.size, lastSeen)
          state.update(next)
          next
      }
  }
}
