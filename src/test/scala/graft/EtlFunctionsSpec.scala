package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.Etl

/** Pins the reference's scalar-function semantics
  * (tests/hooks/test_db.py:95-102, tests/operators/test_ucam_operator.py,
  * tests/hooks/test_ucam_hook.py:113-147, FIXTURES.md §5/§7).
  */
class EtlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def sha256hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("recordHash is sha256(device_type || ref), sensitive to both inputs") {
    val rows = Seq(("BTF", "test_ref"), ("DRM", "test_ref"), ("BTF", "other"))
      .toDF("device_type", "manufacturer_ref")
    val got = rows.select(Etl.recordHash($"device_type", $"manufacturer_ref"))
      .as[String].collect()
    assert(got(0) == sha256hex("BTFtest_ref"))
    assert(got(1) == sha256hex("DRMtest_ref"))
    assert(got.distinct.length == 3)
  }

  test("day-cutoff bucketing matches the reference's pinned table") {
    // FIXTURES.md §5 / tests/operators/test_ucam_operator.py:63-140
    val cases = Seq(
      ("2021-11-29 00:00:00", "00:00:00", "dummy1-dummy1-20211129-20211129"),
      ("2021-11-29 23:59:59", "00:00:00", "dummy1-dummy1-20211129-20211129"),
      ("2021-11-29 08:59:59", "09:00:00", "dummy1-dummy1-20211128-20211129"),
      ("2021-11-29 09:00:00", "09:00:00", "dummy1-dummy1-20211129-20211130"),
      ("2021-11-29 09:00:01", "09:00:00", "dummy1-dummy1-20211129-20211130"))
    cases.foreach { case (start, cutOff, expected) =>
      val df = Seq((start, "dummy-1", "dummy-1")).toDF("s", "dev", "pat")
        .withColumn("start", $"s".cast("timestamp"))
      val got = df.select(Etl.dmpId($"dev", $"pat",
        Etl.bucketStart($"start", cutOff), Etl.bucketEnd($"start", cutOff)))
        .as[String].head()
      assert(got == expected, s"start=$start cutOff=$cutOff")
    }
  }

  test("invalid cut-off strings are rejected (strptime strictness)") {
    // tests/operators/test_ucam_operator.py:143-167
    for (bad <- Seq("9:09", "9:09:", "9h 2m 5s", "25:00:00", "01:01:61"))
      assertThrows[Exception](Etl.validateCutOff(bad))
  }

  test("weartimeMs parses yyyyMMdd to epoch millis (UTC)") {
    val got = Seq("20210101").toDF("d")
      .select(Etl.weartimeMs($"d")).as[Long].head()
    assert(got == 1609459200000L)
  }

  test("normaliseDay zeroes the time-of-day") {
    val got = Seq("2021-11-29 13:45:12").toDF("s")
      .select(date_format(Etl.normaliseDay($"s".cast("timestamp")),
        "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(got == "2021-11-29 00:00:00")
  }

  test("parseDmpFilename splits the 4-part stem (patient-first, dmp.py:68)") {
    val got = Seq("NR1DEVICE-APATIENT-20211213-20211214").toDF("stem")
      .select(Etl.parseDmpFilename($"stem").as("p"))
      .select("p.patient_id", "p.device_id", "p.start_day", "p.end_day")
      .as[(String, String, String, String)].head()
    // NB: the reference parses patient first though the group key was built
    // device-first — inconsistency preserved deliberately (SURVEY.md F10).
    assert(got == (("NR1DEVICE", "APATIENT", "20211213", "20211214")))
  }

  test("jsonDotPath navigates nested objects and list indices") {
    val json = """{"a": {"b": [{"c": 1}, {"c": 2}]}}"""
    val df = Seq(json).toDF("j")
    assert(df.select(Etl.jsonDotPath($"j", "a.b.[1].c")).as[String].head() == "2")
    assert(df.select(Etl.jsonDotPath($"j", "a.b.[0].c")).as[String].head() == "1")
    assert(df.select(Etl.jsonDotPath($"j", "a.missing")).as[String].head() == null)
  }
}
