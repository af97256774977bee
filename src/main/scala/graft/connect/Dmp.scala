package graft.connect

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

import scala.collection.immutable.VectorMap

import graft.connect.MiniJson._

/** S8 — the DMP GraphQL multipart upload (ideafast_etl/hooks/dmp.py:59-160):
  * the reference's most intricate connector, mirrored end-to-end against the
  * Transport seam so ConnectSpec can replay the reference's own mocked-
  * requests test matrix (tests/hooks/test_dmp.py:11-63).
  *
  * Flow (dmp.py:58-160): parse `patient-device-start-end` from the file
  * stem → sha256 checksum → wear times to epoch ms → FileUploadPayload →
  * GraphQL multipart POST (`operations` + `map` + file part) with the JWT
  * header → raise-for-status; a body that fails to parse as JSON or carries
  * an `errors` key is a failed upload. All failures return false (the
  * reference logs and returns False, dmp.py:154-157) so one bad group never
  * aborts the plan.
  */
object Dmp {

  /** The upload GraphQL document (the reference takes it from the dmpy
    * client; shape per the GraphQL multipart request convention its server
    * implements).
    */
  val uploadQuery: String =
    """mutation uploadFile($studyId: String!, $file: Upload!, $description: String, $fileLength: BigInt, $hash: String) {
      |  uploadFile(studyId: $studyId, file: $file, description: $description, fileLength: $fileLength, hash: $hash) {
      |    id
      |  }
      |}""".stripMargin

  /** The `operations` JSON of the multipart request (dmp.py:74-96): study
    * target, null file placeholder (bound via the `map` part), and the
    * description metadata parsed from the bundle filename.
    */
  final case class FileUploadPayload(
      fileName: String,
      patientId: String,
      deviceId: String,
      startWearMs: Long,
      endWearMs: Long,
      checksum: String,
      dataset: String,
      fileLength: Long) {

    def operations: String =
      render(JObj(VectorMap(
        "operationName" -> JStr("uploadFile"),
        "query" -> JStr(uploadQuery),
        "variables" -> JObj(VectorMap(
          "studyId" -> JStr(dataset),
          "file" -> JNull,
          "description" -> JStr(render(JObj(VectorMap(
            "participantId" -> JStr(patientId),
            "deviceId" -> JStr(deviceId),
            "startDate" -> JNum(startWearMs.toString),
            "endDate" -> JNum(endWearMs.toString))))),
          "fileLength" -> JNum(fileLength.toString),
          "hash" -> JStr(checksum))))))
  }

  /** `yyyyMMdd` wear day → epoch ms at UTC midnight; driver-side twin of
    * the dataflow `Etl.weartimeMs` (unix_millis(to_timestamp(c,
    * 'yyyyMMdd')) under the UTC session).
    */
  def weartimeMs(day: String): Long =
    LocalDate.parse(day, DateTimeFormatter.ofPattern("yyyyMMdd"))
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli

  /** Parse the 4 components of a bundle file stem (dmp.py:68). */
  def parseStem(stem: String): (String, String, String, String) =
    stem.split("-") match {
      case Array(p, d, s, e) => (p, d, s, e)
      case parts => throw new IllegalArgumentException(
        s"expected patient-device-start-end stem, got ${parts.length} parts: $stem")
    }

  /** Stream the multipart/form-data body per the GraphQL multipart request
    * spec the reference's MultipartEncoder emits (dmp.py:84-96):
    * `operations` (the mutation + variables), `map` (binds the file part to
    * variables.file), then the binary file part — written to `out` with a
    * fixed-size copy buffer, so a multi-GB bundle never materializes in
    * memory (the reference streams its upload the same way).
    */
  /** The multipart body's fixed parts: (prologue, epilogue) byte arrays —
    * everything before and after the raw file bytes. The composite body is
    * then `prologue ++ <file bytes> ++ epilogue`, streamed without ever
    * materializing the file in memory or copying it on disk.
    */
  def multipartParts(boundary: String,
                     payload: FileUploadPayload): (Array[Byte], Array[Byte]) = {
    def field(name: String, value: String): String =
      s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="$name"\r\n\r\n""" +
        value + "\r\n"
    val prologue =
      field("operations", payload.operations) +
        field("map", """{"fileName": ["variables.file"]}""") +
        s"--$boundary\r\n" +
        s"""Content-Disposition: form-data; name="fileName"; filename="${payload.fileName}"\r\n""" +
        "Content-Type: application/octet-stream\r\n\r\n"
    (prologue.getBytes(StandardCharsets.UTF_8),
      s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Composite InputStream: prologue + file + epilogue, a fresh stream per
    * invocation (HTTP retries re-invoke the supplier).
    */
  def multipartStream(boundary: String, payload: FileUploadPayload,
                      file: Path): () => java.io.InputStream = { () =>
    val (pro, epi) = multipartParts(boundary, payload)
    val parts = java.util.List.of[java.io.InputStream](
      new java.io.ByteArrayInputStream(pro),
      new java.io.BufferedInputStream(new java.io.FileInputStream(file.toFile)),
      new java.io.ByteArrayInputStream(epi))
    new java.io.SequenceInputStream(java.util.Collections.enumeration(parts))
  }

  /** Upload one bundle file to the DMP; true only on a fully-confirmed
    * success. Mirrors dmp.py:58-160's outcome matrix:
    *  - non-2xx        → false (raise_for_status, caught)
    *  - non-JSON body  → false (JSONDecodeError → HTTPError, caught)
    *  - `errors` key   → false (UPLOAD_ERROR, caught)
    *  - otherwise      → true
    */
  def upload(transport: Transport, tokens: TokenProvider, baseUrl: String,
             dataset: String, path: Path,
             log: String => Unit = _ => ()): Boolean = {
    try {
      val stem = {
        val n = path.getFileName.toString
        val dot = n.lastIndexOf('.')
        if (dot > 0) n.substring(0, dot) else n
      }
      val (patientId, deviceId, start, end) = parseStem(stem)
      val payload = FileUploadPayload(
        fileName = path.getFileName.toString,
        patientId = patientId,
        deviceId = deviceId,
        startWearMs = weartimeMs(start),
        endWearMs = weartimeMs(end),
        checksum = FileTransfer.sha256File(path),
        dataset = dataset,
        fileLength = Files.size(path))
      val boundary = "graft-" + java.util.UUID.randomUUID().toString
      // fully streaming body (prologue + file + epilogue composite):
      // constant memory, no temp copy on disk, any bundle size
      val resp = transport.send(HttpRequest("POST", baseUrl,
        Map("Content-Type" -> s"multipart/form-data; boundary=$boundary",
          "Authorization" -> tokens.token()),
        bodyStream = Some(multipartStream(boundary, payload, path))))
      if (!resp.isSuccess) {
        log(s"upload failed: HTTP ${resp.status}")
        return false
      }
      val parsed =
        try MiniJson.parse(resp.bodyString)
        catch {
          case e: Exception =>
            log("unable to unpack HTTP body response in completing DMP upload: "
              + e.getMessage)
            return false
        }
      parsed match {
        case JObj(fields) if fields.contains("errors") =>
          log(s"response was: ${resp.bodyString}")
          false
        case _ =>
          log("uploaded 100%")
          true
      }
    } catch {
      case e: Exception => log(s"exception: ${e.getMessage}"); false
    }
  }
}
