package graft

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.connect._
import graft.init.InitScaffold

/** The init/ scaffold twin round-trips: the generated examples must parse
  * back into WORKING providers and mappings (ref
  * init/connections.yaml.example:1-55, init/variables.json.example:1-6) —
  * an example a user cannot boot from is documentation rot. On-disk
  * artifacts are pinned against the renderer, the dags/ precedent.
  */
class InitScaffoldSpec extends SparkSpec {
  import spark.implicits._

  private def jwt(expEpochSec: Long): String = {
    def b64(s: String) = Base64.getUrlEncoder.withoutPadding()
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))
    s"${b64("""{"alg":"HS256"}""")}.${b64(s"""{"exp": $expEpochSec}""")}.sig"
  }

  test("connections example parses into three ConnectionConfigs with the " +
    "documented extras (jwt_url/jwt_token_path ride the extra JSON)") {
    val conns = InitScaffold.parseConnectionsYaml(
      InitScaffold.connectionsYamlExample)
    assert(conns.keySet == Set("graft_recorder_kiel", "graft_ucam_default",
      "graft_dmp_default"))
    val ucam = InitScaffold.toConnectionConfig(conns("graft_ucam_default"))
    assert(ucam.host == "https://assignments.example.org/api")
    assert(ucam.jwtUrl == "https://assignments.example.org/token")
    assert(ucam.jwtTokenPath == "data.token")
    val rec = InitScaffold.toConnectionConfig(conns("graft_recorder_kiel"))
    assert(rec.extras("user_id") == "recorder-kiel-uid")
  }

  test("parsed UCAM connection boots a working JsonBodyTokenProvider: " +
    "refresh POSTs to the example jwt_url and the example token path " +
    "extracts the token") {
    val conns = InitScaffold.parseConnectionsYaml(
      InitScaffold.connectionsYamlExample)
    val cfg = InitScaffold.toConnectionConfig(conns("graft_ucam_default"))
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    val transport = new MockTransport(Seq({
      case r if r.url == cfg.jwtUrl && r.method == "POST" =>
        // token nested at the example's data.token path
        HttpResponse(200,
          body = s"""{"data": {"token": "$fresh"}}""".getBytes)
    }))
    val p = new JsonBodyTokenProvider(transport, cfg)
    assert(p.token() == fresh)
  }

  test("parsed DMP connection resolves extra://public_key through the " +
    "extras (the long-credential indirection, dmp.py:41-47)") {
    val conns = InitScaffold.parseConnectionsYaml(
      InitScaffold.connectionsYamlExample)
    val cfg = InitScaffold.toConnectionConfig(conns("graft_dmp_default"))
    assert(cfg.login == "extra://public_key")
    assert(cfg.jwtTokenPath == "data.issueAccessToken.accessToken")
    // end-to-end: the refresh request body must carry the RESOLVED key
    // from extras (not the literal extra:// login), and the example's
    // token path must extract the issued token
    val fresh = jwt(System.currentTimeMillis() / 1000 + 3600)
    var seenBody = ""
    val transport = new MockTransport(Seq({
      case r if r.url == cfg.jwtUrl && r.method == "POST" =>
        seenBody = new String(r.effectiveBody, "UTF-8")
        HttpResponse(200, body =
          s"""{"data": {"issueAccessToken": {"accessToken": "$fresh"}}}"""
            .getBytes)
    }))
    val p = new SignatureAuthTokenProvider(transport, cfg)
    assert(p.token() == fresh)
    assert(seenBody.contains("BEGIN PUBLIC KEY"),
      s"pubkey must be resolved from extras into the mutation: $seenBody")
    assert(!seenBody.contains("extra://"),
      s"the extra:// literal must never reach the wire: $seenBody")
  }

  test("variables example feeds assignDataset: the TEST cohort maps to " +
    "its dataset id, a missing cohort fails loudly") {
    val vars = InitScaffold.parseVariablesJson(
      InitScaffold.variablesJsonExample)
    val mapping = vars("dmp_dataset_mappings")
    val recs = Seq((1L, "r1"), (2L, null.asInstanceOf[String]))
      .toDF("dmp_id", "dmp_dataset")
    val got = graft.etl.Stages.assignDataset(recs, mapping, "TEST")
      .select("dmp_dataset").as[String].collect().toSet
    assert(got == Set("dataset-id-for-test-cohort"))
    intercept[NoSuchElementException] {
      graft.etl.Stages.assignDataset(recs, mapping, "UNKNOWN_COHORT")
    }
  }

  test("on-disk init/ artifacts match the renderer (no drift)") {
    def onDisk(name: String): String = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("init", name)), "UTF-8")
    assert(onDisk("connections.yaml.example") ==
      InitScaffold.connectionsYamlExample,
      "regenerate with `sbt \"runMain graft.init.InitScaffold\"`")
    assert(onDisk("variables.json.example") ==
      InitScaffold.variablesJsonExample,
      "regenerate with `sbt \"runMain graft.init.InitScaffold\"`")
    assert(onDisk("ledger-init.sh.example") ==
      InitScaffold.mongoInitExample,
      "regenerate with `sbt \"runMain graft.init.InitScaffold\"`")
  }
}
