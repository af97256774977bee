package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** JVM-global request log: executePlan serializes the transport into
  * executor tasks (copies, even in local mode), so a per-instance log never
  * sees executor traffic — a singleton object does (same JVM at local[*]).
  */
object EtlJobSpecLog {
  val log = new java.util.concurrent.ConcurrentLinkedQueue[graft.connect.HttpRequest]()
}

/** Top-level (no outer pointer) so the executor-serialized closure carries
  * only the scripted mock, while recording globally.
  */
class RecordingTransport(inner: graft.connect.MockTransport)
  extends graft.connect.Transport {
  override def send(r: graft.connect.HttpRequest): graft.connect.HttpResponse = {
    // materialize streamed bodies: the sender deletes its temp body file
    // right after send returns, but assertions read the log later
    EtlJobSpecLog.log.add(r.copy(body = r.effectiveBody, bodyFile = None))
    inner.send(r)
  }
}

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

  test("stage-per-submit parity: 7 runStage calls ≡ one run (DAG deployment mode)") {
    val base = Files.createTempDirectory("graft-job-stages").toString
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

    // seven separate submissions, state crossing only through the ledger —
    // the dags/graft_dreem.py deployment shape
    val summary = EtlJob.stageNames
      .flatMap(s => EtlJob.runStage(spark, s, opts)).toMap
    assert(summary("ingested_new") == 2)
    assert(summary("with_serial") == 2)
    assert(summary("with_device") == 2)
    assert(summary("with_patient") == 2)
    assert(summary("grouped") == 2)
    assert(summary("uploaded_groups") == 2)
    assert(Files.exists(Paths.get(s"$base/work/landed")),
      "cleanup must preserve the landed (external-sink stand-in) dir")

    // a crashed extract's scratch is swept by the cleanup task
    Files.createDirectories(Paths.get(s"$base/work/GROUP-crashed"))
    val cleaned = EtlJob.runStage(spark, "cleanup", opts).toMap
    assert(cleaned("cleaned_entries") == 1)
    assert(!Files.exists(Paths.get(s"$base/work/GROUP-crashed")))
    assert(Files.exists(Paths.get(s"$base/work/landed")))

    // unknown stage fail-fasts with the valid ids listed
    val err = intercept[IllegalArgumentException] {
      EtlJob.runStage(spark, "no_such_stage", opts)
    }
    assert(err.getMessage.contains("download_metadata"))
  }

  test("EtlJob.run --upload-limit bounds the per-run transfer batch (reference limit=1)") {
    val base = Files.createTempDirectory("graft-job-lim").toString
    // two distinct devices/days -> two upload groups
    Seq(("r1", "U1", "2021-11-10 13:00:00"), ("r2", "U2", "2021-11-11 13:00:00"))
      .toDF("manufacturer_ref", "uid", "s")
      .select(col("manufacturer_ref"), lit("DRM").as("device_type"),
        col("s").cast("timestamp").as("start"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 HOURS")).as("end"),
        map(lit("dreem_uid"), col("uid")).as("meta"))
      .write.parquet(s"$base/incoming")
    Files.write(Paths.get(base, "uid_serial.csv"), "U1,S1\nU2,S2\n".getBytes)
    Files.write(Paths.get(base, "serial_id.csv"), "S1,DEV-1\nS2,DEV-2\n".getBytes)
    Seq(("DEV-1", "P-A", "2021-11-01 00:00:00", null: String),
      ("DEV-2", "P-B", "2021-11-01 00:00:00", null: String))
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
      "upload-limit" -> "1", // the reference's per-run group cap
      "ledger-bucket-width" -> "2", // exercise the threaded width too
      "simulate-transfer" -> "true")
    val run1 = EtlJob.run(spark, opts).toMap
    assert(run1("pending_groups") == 2)
    assert(run1("uploaded_groups") == 1) // capped, not 2
    // the un-transferred group drains on the next run (at-least-once)
    val run2 = EtlJob.run(spark, opts).toMap
    assert(run2("pending_groups") == 1)
    assert(run2("uploaded_groups") == 1)
    val run3 = EtlJob.run(spark, opts).toMap
    assert(run3("pending_groups") == 0 && run3("uploaded_groups") == 0)
  }

  test("EtlJob.run multi-site: unions per-site incoming, dedups across sites") {
    val base = Files.createTempDirectory("graft-job-sites").toString
    def incoming(rows: Seq[(String, String, String)]) = rows
      .toDF("manufacturer_ref", "uid", "s")
      .select(col("manufacturer_ref"), lit("DRM").as("device_type"),
        col("s").cast("timestamp").as("start"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 HOURS")).as("end"),
        map(lit("dreem_uid"), col("uid")).as("meta"))
    // r2 appears at BOTH sites — and the sites DISAGREE on start (clock
    // skew): one ledger row, and the survivor must be the deterministic
    // minimum (earliest start), not whichever partition wins a race
    incoming(Seq(("r1", "U1", "2021-11-10 13:00:00"),
      ("r2", "U2", "2021-11-10 14:00:00"))).write.parquet(s"$base/site_kiel")
    incoming(Seq(("r2", "U2", "2021-11-10 13:30:00"),
      ("r3", "U1", "2021-11-11 09:00:00"))).write.parquet(s"$base/site_newcastle")
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
      "ledger" -> s"$base/ledger",
      // what parseArgs builds from a repeated --incoming flag
      "incoming" -> Seq(s"$base/site_kiel", s"$base/site_newcastle")
        .mkString(0.toChar.toString),
      "uid-serial" -> s"$base/uid_serial.csv",
      "serial-id" -> s"$base/serial_id.csv",
      "assignments" -> s"$base/assignments",
      "workdir" -> s"$base/work", "today" -> "2021-12-01",
      "simulate-transfer" -> "true")
    val summary = EtlJob.run(spark, opts).toMap
    assert(summary("ingested_new") == 3) // 4 site rows, r2 cross-site deduped
    assert(summary("ledger_rows") == 3)
    assert(summary("with_patient") == 3)
    val r2start = new graft.ledger.Ledger(spark, s"$base/ledger").read()
      .filter(col("manufacturer_ref") === "r2")
      .select(date_format(col("start"), "HH:mm:ss")).as[String].collect()
    assert(r2start.toSeq == Seq("13:30:00")) // deterministic earliest-start survivor
  }

  test("dedupBatch: hash-keyed survivor is deterministic; null-key rows bypass") {
    val batch = Seq(
      // two true duplicates (same identity, sites disagree on start)
      (Some("DRM"), "r1", "2021-11-10 14:00:00"),
      (Some("DRM"), "r1", "2021-11-10 13:30:00"),
      // null device_type -> null hash: NOT an identity; both must survive
      (None: Option[String], "r8", "2021-11-10 10:00:00"),
      (None: Option[String], "r9", "2021-11-10 11:00:00"))
      .toDF("device_type", "manufacturer_ref", "s")
      .select(col("device_type"), col("manufacturer_ref"),
        col("s").cast("timestamp").as("start"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 HOURS")).as("end"),
        map(lit("k"), lit("v")).as("meta"))
    val out = EtlJob.dedupBatch(batch)
      .select(col("manufacturer_ref"), date_format(col("start"), "HH:mm:ss"))
      .as[(String, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("r1", "13:30:00"), // deterministic earliest-start survivor
      ("r8", "10:00:00"), ("r9", "11:00:00"))) // null-key rows untouched
  }

  test("EtlJob.run live transfer: chunkedFetch + Dmp.upload against scripted endpoints") {
    import graft.connect.{HttpResponse, MockTransport}
    val base = Files.createTempDirectory("graft-job-live").toString
    Seq(("r1", "U1", "2021-11-10 13:00:00"), ("r2", "U1", "2021-11-10 14:00:00"))
      .toDF("manufacturer_ref", "uid", "s")
      .select(col("manufacturer_ref"), lit("DRM").as("device_type"),
        col("s").cast("timestamp").as("start"),
        (col("s").cast("timestamp") + expr("INTERVAL 2 HOURS")).as("end"),
        map(lit("dreem_uid"), col("uid")).as("meta"))
      .write.parquet(s"$base/incoming")
    Files.write(Paths.get(base, "uid_serial.csv"), "U1,S1\n".getBytes)
    Files.write(Paths.get(base, "serial_id.csv"), "S1,DEV-1\n".getBytes)
    Seq(("DEV-1", "P-A", "2021-11-01 00:00:00", null: String))
      .toDF("device_id", "patient_id", "sw", "ew")
      .select(col("device_id"), col("patient_id"),
        col("sw").cast("timestamp").as("start_wear"),
        col("ew").cast("timestamp").as("end_wear"))
      .write.parquet(s"$base/assignments")

    def jwtTok(exp: Long): String = {
      val enc = java.util.Base64.getUrlEncoder.withoutPadding()
      enc.encodeToString("""{"alg":"none"}""".getBytes) + "." +
        enc.encodeToString(s"""{"exp":$exp}""".getBytes) + ".s"
    }
    val tok = jwtTok(System.currentTimeMillis() / 1000 + 3600)
    val mock = new MockTransport(Seq(
      { case r if r.url == "https://drm/token" =>
          HttpResponse(200, body = s"""{"token": "$tok"}""".getBytes) },
      { case r if r.url == "https://dmp/token" =>
          HttpResponse(200, body =
            s"""{"data": {"issueAccessToken": {"accessToken": "$tok"}}}""".getBytes) },
      { case r if r.url.matches("https://drm/dreem/algorythm/record/r./h5/") =>
          val ref = r.url.split("/")(5)
          HttpResponse(200, body = s"""{"data_url": "https://cdn/$ref"}""".getBytes) },
      { case r if r.url.startsWith("https://cdn/") =>
          HttpResponse(200, body = ("payload-" + r.url.split("/").last).getBytes) },
      { case r if r.url == "https://dmp/graphql" && r.method == "POST" =>
          HttpResponse(200, body = "{}".getBytes) }))
    val transport = new RecordingTransport(mock)

    val opts = Map(
      "ledger" -> s"$base/ledger", "incoming" -> s"$base/incoming",
      "uid-serial" -> s"$base/uid_serial.csv",
      "serial-id" -> s"$base/serial_id.csv",
      "assignments" -> s"$base/assignments",
      "workdir" -> s"$base/work", "today" -> "2021-12-01",
      "drm-base" -> "https://drm", "drm-jwt-url" -> "https://drm/token",
      "dmp-url" -> "https://dmp/graphql", "dmp-jwt-url" -> "https://dmp/token",
      "dmp-dataset" -> "STUDY1")
    EtlJobSpecLog.log.clear()
    val summary = EtlJob.run(spark, opts, transport).toMap
    assert(summary("uploaded_groups") == 1) // one group (same uid/device/day)
    // the upload POST carried the GraphQL multipart payload with the dataset
    import scala.jdk.CollectionConverters._
    val upload = EtlJobSpecLog.log.asScala
      .find(r => r.url == "https://dmp/graphql" && r.body.nonEmpty)
    assert(upload.isDefined)
    assert(new String(upload.get.body, "UTF-8").contains(""""studyId":"STUDY1""""))
    // second run: group already uploaded, no further transfer requests
    val posts = EtlJobSpecLog.log.size
    val again = EtlJob.run(spark, opts, transport).toMap
    assert(again("uploaded_groups") == 0)
    assert(EtlJobSpecLog.log.size == posts) // no new fetch/upload traffic
  }
}
