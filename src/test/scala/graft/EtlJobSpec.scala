package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Drives the runnable job end-to-end (the SparkSubmitOperator surface). */
class EtlJobSpec extends SparkSpec {
  import spark.implicits._

  test("EtlJob.run executes the whole chain and reports state counts") {
    val base = Files.createTempDirectory("graft-job").toString
    Seq(("r1", "U1", "2021-11-10 13:00:00"), ("r2", "U2", "2021-11-10 14:00:00"))
      .toDF("manufacturer_ref", "uid", "s")
      .select(col("manufacturer_ref"), lit("DRM").as("device_type"),
        col("s").cast("timestamp").as("start"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 HOURS")).as("end"),
        map(lit("dreem_uid"), col("uid")).as("meta"))
      .write.parquet(s"$base/incoming")
    Files.write(Paths.get(base, "uid_serial.csv"), "U1,S1\nU2,S2\n".getBytes)
    Files.write(Paths.get(base, "serial_id.csv"), "S1,DEV-1\nS2,DEV-2\n".getBytes)
    Seq(("DEV-1", "P-A", "2021-11-01 00:00:00", null: String),
      ("DEV-2", "P-B", "2021-11-01 00:00:00", "2021-11-30 00:00:00"))
      .toDF("device_id", "patient_id", "sw", "ew")
      .select(col("device_id"), col("patient_id"),
        col("sw").cast("timestamp").as("start_wear"),
        col("ew").cast("timestamp").as("end_wear"))
      .write.parquet(s"$base/assignments")

    val opts = Map(
      "ledger" -> s"$base/ledger", "incoming" -> s"$base/incoming",
      "uid-serial" -> s"$base/uid_serial.csv",
      "serial-id" -> s"$base/serial_id.csv",
      "assignments" -> s"$base/assignments",
      "workdir" -> s"$base/work", "today" -> "2021-12-01",
      "simulate-transfer" -> "true")
    val summary = EtlJob.run(spark, opts).toMap
    assert(summary("ingested_new") == 2)
    assert(summary("ledger_rows") == 2)
    assert(summary("with_patient") == 2)
    assert(summary("grouped") == 2)
    assert(summary("uploaded_groups") == 2)
    assert(Files.exists(Paths.get(s"$base/work/landed")))

    // second run: nothing new, nothing re-uploaded
    val again = EtlJob.run(spark, opts).toMap
    assert(again("ingested_new") == 0)
    assert(again("ledger_rows") == 2)
    assert(again("pending_groups") == 0)
    assert(again("uploaded_groups") == 0)
  }
}
