package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.connect.{HttpRequest, HttpResponse, Transport}

/** File-backed transport for the DSv2 test: serves `file://` URLs from disk.
  * Instantiated reflectively on the executor (no-arg ctor), like a real
  * authenticated transport subclass would be.
  */
class FileTransport extends Transport {
  override def send(req: HttpRequest): HttpResponse = {
    val p = Paths.get(new java.net.URI(req.url))
    if (Files.exists(p)) HttpResponse(200, body = Files.readAllBytes(p))
    else HttpResponse(404)
  }
}

class RestDataSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 REST source: one partition per page, records as JSON rows") {
    val dir = Files.createTempDirectory("graft-dsv2")
    Files.write(dir.resolve("page-0.json"),
      """{"results": [{"id": "a", "v": 1}, {"id": "b", "v": 2}]}""".getBytes)
    Files.write(dir.resolve("page-1.json"),
      """{"results": [{"id": "c", "v": 3}]}""".getBytes)
    Files.write(dir.resolve("page-2.json"),
      """{"results": []}""".getBytes)

    val df = spark.read.format("graft.sources.v2.RestPageDataSource")
      .option("urlTemplate", dir.toUri.toString + "page-{page}.json")
      .option("pages", "3")
      .option("transportClass", classOf[FileTransport].getName)
      .load()

    assert(df.rdd.getNumPartitions == 3) // one InputPartition per page
    val parsed = df.select(col("page"),
      get_json_object(col("record"), "$.id").as("id"),
      get_json_object(col("record"), "$.v").cast("int").as("v"))
      .as[(Int, String, Int)].collect().sortBy(_._3)
    assert(parsed.toSeq == Seq((0, "a", 1), (0, "b", 2), (1, "c", 3)))
  }

  test("DSv2 REST source surfaces HTTP failures per partition") {
    val dir = Files.createTempDirectory("graft-dsv2-missing")
    val df = spark.read.format("graft.sources.v2.RestPageDataSource")
      .option("urlTemplate", dir.toUri.toString + "page-{page}.json")
      .option("pages", "1")
      .option("transportClass", classOf[FileTransport].getName)
      .load()
    val ex = intercept[Exception](df.count())
    assert(ex.getMessage.contains("HTTP 404") ||
      String.valueOf(ex.getCause).contains("HTTP 404"))
  }
}
