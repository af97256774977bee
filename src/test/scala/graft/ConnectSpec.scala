package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import graft.connect._

/** Connector layer semantics: JWT expiry/refresh/persistence, dot-path
  * navigation, pagination exhaustion, transfer plan execution — mirroring
  * tests/hooks/test_jwt.py, test_drm.py, test_dmp.py.
  */
class ConnectSpec extends SparkSpec {
  import spark.implicits._

  private def jwt(expEpochSec: Long): String = {
    def b64(s: String) = Base64.getUrlEncoder.withoutPadding()
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))
    s"${b64("""{"alg":"HS256"}""")}.${b64(s"""{"exp": $expEpochSec}""")}.sig"
  }

  test("Jwt.expiry parses the exp claim; malformed tokens are expired") {
    assert(Jwt.expiry(jwt(12345)).contains(12345L))
    assert(Jwt.expiry("garbage").isEmpty)
    assert(Jwt.isExpired(jwt(100), nowEpochSec = 200))
    assert(!Jwt.isExpired(jwt(300), nowEpochSec = 200))
    assert(Jwt.isExpired("garbage", 0))
  }

  test("Jwt.dotPath navigates objects and list indices, None-safe") {
    // tests/hooks/test_jwt.py:11-88 haystack semantics
    val json = """{"a": {"b": [{"c": "deep"}, {"c": "deeper"}]}, "top": "t"}"""
    assert(Jwt.dotPath(json, "top").contains("t"))
    assert(Jwt.dotPath(json, "a.b.[1].c").contains("deeper"))
    assert(Jwt.dotPath(json, "a.b.[5].c").isEmpty)   // out of bounds
    assert(Jwt.dotPath(json, "a.missing").isEmpty)
    assert(Jwt.dotPath("""{"a": null}""", "a.b").isEmpty)
  }

  test("MiniJson: truncated input raises the documented parse error, not a raw index exception") {
    // every truncation point of a nested document — the parser contract is
    // IllegalArgumentException (which callers catch), never
    // StringIndexOutOfBoundsException escaping from a malformed response
    val full = """{"a": [1, "xAy", {"b": true}], "c": null}"""
    for (cut <- 1 until full.length) {
      val t = full.take(cut)
      try { MiniJson.parse(t); () }
      catch {
        case _: IllegalArgumentException => () // the documented failure
        case e: Throwable => fail(s"cut=$cut: ${e.getClass.getName}: $e")
      }
    }
    assert(MiniJson.parse(full).isInstanceOf[MiniJson.JObj])
  }

  test("TokenProvider refreshes only when expired and persists the new token") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val transport = new MockTransport(Seq({
      case r if r.url == "https://x/jwt" =>
        HttpResponse(200, body = s"""{"token": "$fresh"}""".getBytes)
    }))
    var persisted = List.empty[String]
    val p = new BasicAuthTokenProvider(transport,
      ConnectionConfig("https://x", "u", "pw", "https://x/jwt", "token",
        jwtToken = Some(jwt(0)))) { // cached token long expired
      override protected def persist(t: String): Unit = persisted ::= t
    }
    assert(p.token() == fresh)       // refreshed
    assert(p.token() == fresh)       // cached now — no second call
    assert(transport.log.size == 1)
    assert(persisted == List(fresh))
    val basic = transport.log.head.headers("Authorization")
    assert(basic.startsWith("Basic "))
  }

  test("JsonBodyTokenProvider posts UCAM-style credentials") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val transport = new MockTransport(Seq({
      case r => HttpResponse(200, body = s"""{"token": "$fresh"}""".getBytes)
    }))
    val p = new JsonBodyTokenProvider(transport,
      ConnectionConfig("https://u", "usr", "pw", "https://u/jwt"))
    p.token()
    val body = new String(transport.log.head.body, "UTF-8")
    val parsed = MiniJson.parse(body).asInstanceOf[MiniJson.JObj]
    assert(parsed.fields("Username") == MiniJson.JStr("usr"))
    assert(parsed.fields("Password") == MiniJson.JStr("pw"))
  }

  test("PaginatedRestSource follows next cursors until null (drm.py:41-46)") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    def page(items: Seq[Int], next: Option[String]) =
      s"""{"next": ${next.map("\"" + _ + "\"").getOrElse("null")},
          "results": [${items.map(i => s"""{"id": "$i"}""").mkString(",")}]}"""
    val transport = new MockTransport(Seq(
      { case r if r.url.contains("limit=2") && !r.url.contains("p2") =>
          HttpResponse(200, body = page(Seq(1, 2), Some("https://h/p2")).getBytes) },
      { case r if r.url == "https://h/p2" =>
          HttpResponse(200, body = page(Seq(3), None).getBytes) }))
    val auth = new BasicAuthTokenProvider(transport,
      ConnectionConfig("https://h", jwtToken = Some(fresh)))
    val src = new PaginatedRestSource(transport, auth, "https://h", pageSize = 2)
    val got = src.fetchAll("/records").toList
    assert(got.size == 3)
    assert(got.map(_.fields("id")) ==
      List(MiniJson.JStr("1"), MiniJson.JStr("2"), MiniJson.JStr("3")))
  }

  test("FileTransfer.executePlan: download→zip→upload per group; unready files retry") {
    val work = Files.createTempDirectory("graft-transfer").toString
    val landedDir = Files.createTempDirectory("graft-landed").toString
    val plan = Seq(
      ("G1", Seq("r1", "r2")),   // both files available → uploaded
      ("G2", Seq("r3", "MISSING"))) // one unready → whole group retried
      .toDF("dmp_id", "member_refs")
    val got = FileTransfer.executePlan(spark, plan, work,
      fetch = (ref, path) => {
        if (ref == "MISSING") false
        else { Files.write(path, s"payload-$ref".getBytes); true }
      },
      push = (dmpId, zip) => {
        Files.copy(zip, Paths.get(landedDir, s"$dmpId.zip")); true
      })
      .select($"dmp_id", $"uploaded", $"error")
      .as[(String, Boolean, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got("G1") == ((true, "")))
    assert(got("G2") == ((false, "file not ready upstream")))
    assert(Files.exists(Paths.get(landedDir, "G1.zip")))
    assert(!Files.exists(Paths.get(landedDir, "G2.zip")))
    // work dirs cleaned up (the ALL_DONE finalizer)
    assert(!Files.exists(Paths.get(work, "G1")) && !Files.exists(Paths.get(work, "G2")))
  }

  test("zip + sha256 checksum round-trip") {
    val dir = Files.createTempDirectory("graft-zip")
    Files.write(dir.resolve("a.h5"), "aaa".getBytes)
    Files.write(dir.resolve("b.h5"), "bbb".getBytes)
    val zip = FileTransfer.zipFolder(dir)
    assert(Files.exists(zip) && Files.size(zip) > 0)
    val sum = FileTransfer.sha256File(zip)
    assert(sum.length == 64)
    assert(sum == FileTransfer.sha256File(zip)) // deterministic
  }

  test("executePlan rejects member_refs that escape the work folder") {
    val work = Files.createTempDirectory("graft-evil").toString
    val plan = Seq(("G1", Seq("../../etc/passwd")), ("G2", Seq("sub/dir")))
      .toDF("dmp_id", "member_refs")
    val got = FileTransfer.executePlan(spark, plan, work,
      fetch = (_, path) => { Files.write(path, "x".getBytes); true },
      push = (_, _) => true)
      .select($"dmp_id", $"uploaded", $"error")
      .as[(String, Boolean, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(!got("G1")._1 && got("G1")._2.contains("unsafe member_ref"))
    assert(!got("G2")._1 && got("G2")._2.contains("unsafe member_ref"))
  }

  // --- SignatureAuthTokenProvider (dmp.py:37-57 parity) -------------------

  test("SignatureAuthTokenProvider posts GraphQL pubkey/signature; extra:// resolves") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val transport = new MockTransport(Seq({
      case r => HttpResponse(200,
        body = s"""{"data": {"issueAccessToken": {"accessToken": "$fresh"}}}""".getBytes)
    }))
    val p = new SignatureAuthTokenProvider(transport,
      ConnectionConfig("https://dmp", login = "extra://pub_key", password = "sig\"ned",
        jwtUrl = "https://dmp/graphql",
        jwtTokenPath = "data.issueAccessToken.accessToken",
        extras = Map("pub_key" -> "LONG-PUBLIC-KEY")))
    assert(p.token() == fresh)
    val body = new String(transport.log.head.body, "UTF-8")
    val parsed = MiniJson.parse(body).asInstanceOf[MiniJson.JObj]
    val vars = parsed.fields("variables").asInstanceOf[MiniJson.JObj]
    assert(vars.fields("pubkey") == MiniJson.JStr("LONG-PUBLIC-KEY"))
    assert(vars.fields("signature") == MiniJson.JStr("sig\"ned")) // escaped, not injected
    assert(parsed.fields("query").asInstanceOf[MiniJson.JStr].s.contains("issueAccessToken"))
  }

  test("SignatureAuthTokenProvider fails clearly on a missing extras key") {
    val p = new SignatureAuthTokenProvider(new MockTransport(Seq.empty),
      ConnectionConfig("https://dmp", login = "extra://nope",
        jwtUrl = "https://dmp/graphql"))
    intercept[NoSuchElementException](p.token())
  }

  // --- Dmp.upload (tests/hooks/test_dmp.py:11-63 parity) ------------------

  private def dmpFixture(bodyOrStatus: Either[Int, String]): (MockTransport, java.nio.file.Path) = {
    val dir = Files.createTempDirectory("graft-dmp")
    val f = dir.resolve("P001-D042-20240101-20240107.zip")
    Files.write(f, "zipbytes".getBytes)
    val transport = new MockTransport(Seq({
      case r if r.url == "https://dmp/graphql" => bodyOrStatus match {
        case Left(status) => HttpResponse(status)
        case Right(body) => HttpResponse(200, body = body.getBytes)
      }
    }))
    (transport, f)
  }

  private def dmpTokens(transport: MockTransport) =
    new SignatureAuthTokenProvider(transport,
      ConnectionConfig("https://dmp",
        jwtToken = Some(jwt(System.currentTimeMillis() / 1000 + 3600))))

  test("Dmp.upload success: multipart payload parses filename, checksum, weartimes") {
    val (transport, f) = dmpFixture(Right("{}"))
    assert(Dmp.upload(transport, dmpTokens(transport), "https://dmp/graphql",
      "STUDY1", f))
    val req = transport.log.head
    val body = new String(req.body, "UTF-8")
    assert(req.headers("Content-Type").startsWith("multipart/form-data; boundary="))
    // operations part carries the parsed stem fields and checksum
    assert(body.contains(""""studyId":"STUDY1""""))
    assert(body.contains("P001"))
    assert(body.contains("D042"))
    assert(body.contains(FileTransfer.sha256File(f)))
    assert(body.contains(Dmp.weartimeMs("20240101").toString))
    // map part binds the file part per the GraphQL multipart convention
    assert(body.contains(""""fileName": ["variables.file"]"""))
    assert(body.contains("zipbytes"))
  }

  test("Dmp.upload error: body with errors key -> false (test_upload_error)") {
    val (transport, f) = dmpFixture(Right("""{"errors": "error"}"""))
    assert(!Dmp.upload(transport, dmpTokens(transport), "https://dmp/graphql", "S", f))
  }

  test("Dmp.upload error: non-JSON body -> false (test_upload_error_no_json)") {
    val (transport, f) = dmpFixture(Right("not json at all"))
    assert(!Dmp.upload(transport, dmpTokens(transport), "https://dmp/graphql", "S", f))
  }

  test("Dmp.upload error: HTTP failure -> false") {
    val (transport, f) = dmpFixture(Left(500))
    assert(!Dmp.upload(transport, dmpTokens(transport), "https://dmp/graphql", "S", f))
  }

  test("Dmp.weartimeMs matches the dataflow Etl.weartimeMs") {
    val driverSide = Seq("20240101", "19991231", "20250615").map(Dmp.weartimeMs)
    val sparkSide = Seq("20240101", "19991231", "20250615").toDF("d")
      .select(graft.functions.Etl.weartimeMs($"d")).as[Long].collect().toSeq
    assert(driverSide == sparkSide)
  }

  // --- chunkedFetch (drm.py:48-90 parity) ---------------------------------

  test("chunkedFetch: missing data_url -> not ready (false), no download attempted") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val transport = new MockTransport(Seq({
      case r if r.url == "https://drm/rec/R1/h5/" =>
        HttpResponse(200, body = """{"status": "processing"}""".getBytes)
    }))
    val tokens = new BasicAuthTokenProvider(transport,
      ConnectionConfig("https://drm", jwtToken = Some(fresh)))
    val target = Files.createTempDirectory("graft-dl").resolve("R1.h5")
    val ok = FileTransfer.chunkedFetch(transport, tokens,
      ref => s"https://drm/rec/$ref/h5/")("R1", target)
    assert(!ok)
    assert(!Files.exists(target))
    assert(transport.log.size == 1) // never hit a file url
  }

  test("chunkedFetch: data_url present -> streams bytes to target, true") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val payload = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val transport = new MockTransport(Seq(
      { case r if r.url == "https://drm/rec/R2/h5/" =>
          HttpResponse(200, body = """{"data_url": "https://cdn/signed/R2"}""".getBytes) },
      { case r if r.url == "https://cdn/signed/R2" =>
          assert(!r.headers.contains("Authorization")) // url embeds auth
          HttpResponse(200, body = payload) }))
    val tokens = new BasicAuthTokenProvider(transport,
      ConnectionConfig("https://drm", jwtToken = Some(fresh)))
    val target = Files.createTempDirectory("graft-dl").resolve("R2.h5")
    val progress = scala.collection.mutable.ArrayBuffer.empty[String]
    val ok = FileTransfer.chunkedFetch(transport, tokens,
      ref => s"https://drm/rec/$ref/h5/", progress += _)("R2", target)
    assert(ok)
    assert(java.util.Arrays.equals(Files.readAllBytes(target), payload))
    assert(progress.last == "100% Downloaded")
  }

  test("chunkedFetch: body is STREAMED in bounded chunks, never buffered") {
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val payload = Array.tabulate[Byte](64 * 1024 + 37)(i => (i % 251).toByte)
    val readSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    // a transport whose streaming body records every read request — if
    // chunkedFetch materialized the body (readAllBytes-style), single read
    // lengths would exceed the 1 KiB chunk contract
    val inner = new MockTransport(Seq({
      case r if r.url == "https://drm/rec/R3/h5/" =>
        HttpResponse(200, body = """{"data_url": "https://cdn/signed/R3"}""".getBytes)
    }))
    val transport = new Transport {
      override def send(req: HttpRequest): HttpResponse = inner.send(req)
      override def sendStreaming(req: HttpRequest): StreamingHttpResponse = {
        assert(req.url == "https://cdn/signed/R3")
        val src = new java.io.ByteArrayInputStream(payload)
        val spying = new java.io.InputStream {
          override def read(): Int = { readSizes += 1; src.read() }
          override def read(b: Array[Byte], off: Int, len: Int): Int = {
            readSizes += len; src.read(b, off, len)
          }
        }
        StreamingHttpResponse(200,
          Map("Content-Length" -> payload.length.toString), spying)
      }
    }
    val tokens = new BasicAuthTokenProvider(inner,
      ConnectionConfig("https://drm", jwtToken = Some(fresh)))
    val target = Files.createTempDirectory("graft-dl").resolve("R3.h5")
    val progress = scala.collection.mutable.ArrayBuffer.empty[String]
    val ok = FileTransfer.chunkedFetch(transport, tokens,
      ref => s"https://drm/rec/$ref/h5/", progress += _)("R3", target)
    assert(ok)
    assert(java.util.Arrays.equals(Files.readAllBytes(target), payload))
    // constant-memory contract: every read bounded by the 1 KiB chunk,
    // and the copy took many reads (no one-shot slurp)
    assert(readSizes.nonEmpty && readSizes.forall(_ <= 1024))
    assert(readSizes.size >= payload.length / 1024)
    // 10%-step progress derived from Content-Length while streaming
    assert(progress.count(_.endsWith("% Downloaded")) >= 5)
    assert(progress.last == "100% Downloaded")
  }

  test("StreamingHttpResponse.contentLength degrades on bad headers; " +
      "truncated bodies are rejected") {
    import graft.connect.StreamingHttpResponse
    def resp(v: String) = StreamingHttpResponse(200,
      Map("Content-Length" -> v), new java.io.ByteArrayInputStream(Array[Byte]()))
    assert(resp("1048576").contentLength == 1048576L)
    assert(resp("1048576,1048576").contentLength == 1048576L) // comma-joined repeat
    assert(resp("garbage").contentLength == -1L)              // degrade, not throw
    // a body shorter than Content-Length must fail the fetch, not pass as EOF
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val inner = new MockTransport(Seq({
      case r if r.url == "https://drm/rec/R4/h5/" =>
        HttpResponse(200, body = """{"data_url": "https://cdn/signed/R4"}""".getBytes)
    }))
    val transport = new graft.connect.Transport {
      override def send(req: HttpRequest): HttpResponse = inner.send(req)
      override def sendStreaming(req: HttpRequest): StreamingHttpResponse =
        StreamingHttpResponse(200, Map("Content-Length" -> "5000"),
          new java.io.ByteArrayInputStream(new Array[Byte](1234))) // short!
    }
    val tokens = new BasicAuthTokenProvider(inner,
      ConnectionConfig("https://drm", jwtToken = Some(fresh)))
    val target = Files.createTempDirectory("graft-dl").resolve("R4.h5")
    val e = intercept[java.io.IOException] {
      FileTransfer.chunkedFetch(transport, tokens,
        ref => s"https://drm/rec/$ref/h5/")("R4", target)
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("IdleTimeoutInputStream aborts a stalled body read — even when the " +
      "unblocked read surfaces as clean EOF, and never for slow consumers") {
    // mimic the REAL JDK client body stream: a read blocked during an
    // async close() unblocks with -1 (EOF sentinel), NOT an exception —
    // the watchdog must turn that into a throw or a stalled download
    // would pass as complete
    def stallingStream(chunks: Int): java.io.InputStream = new java.io.InputStream {
      private val lock = new Object
      @volatile private var closed = false
      private var served = 0
      override def read(): Int = {
        if (served < chunks) { served += 1; 42 }
        else lock.synchronized {
          while (!closed) lock.wait(50)
          -1 // clean EOF on close-while-blocked, like HttpResponseInputStream
        }
      }
      override def close(): Unit = {
        closed = true; lock.synchronized(lock.notifyAll())
      }
    }
    val in = new graft.connect.IdleTimeoutInputStream(
      stallingStream(1), java.time.Duration.ofMillis(150))
    assert(in.read() == 42) // live reads pass through
    val e = intercept[java.io.IOException](in.read()) // stall -> abort
    assert(e.getMessage.contains("blocked"))

    // slow CONSUMER, fast producer: long pauses BETWEEN reads must not
    // abort — only an in-flight blocked read arms the watchdog
    val in2 = new graft.connect.IdleTimeoutInputStream(
      stallingStream(3), java.time.Duration.ofMillis(120))
    assert(in2.read() == 42)
    Thread.sleep(400) // consumer busy elsewhere, way past the idle bound
    assert(in2.read() == 42) // still healthy
    in2.close()
  }
}
