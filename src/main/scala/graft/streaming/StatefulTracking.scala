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

  /** Streaming EWMA state — O(1) per key where the batch operator
    * (`EventAnalytics.ewmaCents`) holds the full timeline. */
  final case class EwmaState(key: String, n_events: Long, ewma_cents: Long)

  /** Incremental twin of `EventAnalytics.ewmaCents` (α = mix/den, exact
    * integer fold e′ = ((den−mix)·e + mix·x) div den over cents): carries
    * ONE running value per key across micro-batches, so unbounded-history
    * keys that outgrow the batch operator's timeline-collect bound stream
    * instead. Within a batch, rows fold in (ts, tie) order; determinism
    * across a REPLAYED batch boundary holds because the fold is
    * associative-free but checkpoint-replay re-delivers whole batches in
    * order (exactly-once sink discipline, q134's posture).
    *
    * Input rows: (key, ts, tieBreak, cents).
    */
  def trackEwma(spark: SparkSession,
                records: Dataset[(String, Timestamp, Long, Long)],
                mix: Int = 1, den: Int = 4): Dataset[EwmaState] = {
    require(den >= 2 && mix >= 1 && mix < den,
      s"need 0 < mix/den < 1, got $mix/$den")
    import spark.implicits._
    val keep = den - mix
    records
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Timestamp, Long, Long)],
         state: GroupState[EwmaState]) =>
          val ordered = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          val prev = state.getOption
          val init = prev.map(_.ewma_cents)
          val folded = ordered.foldLeft(init) {
            case (None, r) => Some(r._4)
            case (Some(e), r) => Some((keep * e + mix * r._4) / den)
          }
          val next = EwmaState(key,
            prev.map(_.n_events).getOrElse(0L) + ordered.size,
            folded.getOrElse(0L))
          state.update(next)
          next
      }
  }
}
