package graft.init

import graft.connect.{ConnectionConfig, MiniJson}

/** First-boot scaffold twin of the reference's `init/` directory
  * (init/connections.yaml.example:1-55, init/variables.json.example:1-6,
  * init/mongo-init.sh): generated EXAMPLE configs for the three upstream
  * connections and the dataset-mapping variable, plus the ledger-store
  * bootstrap script. Like dags/, the on-disk files are render artifacts
  * pinned by InitScaffoldSpec — edit HERE, regenerate with
  * `sbt "runMain graft.init.InitScaffold"`, never hand-edit the files.
  *
  * The examples are ROUND-TRIPPED by the spec: parse back into
  * [[ConnectionConfig]]s, build working token providers against a mock
  * transport (including the `extra://public_key` indirection the DMP
  * connection documents, dmp.py:41-47), and feed `assignDataset` from the
  * parsed variable map — an example a user cannot actually boot from is
  * documentation rot.
  */
object InitScaffold {

  /** One example connection: Airflow's public connection schema fields
    * (conn_type/description/host/login/password/extra), which is the
    * wire format both the reference and any Airflow deployment consume.
    */
  final case class ConnExample(name: String, description: String,
                               host: String, login: String,
                               password: String,
                               extra: Seq[(String, String)])

  /** The three upstream connections, graft-flavored placeholders:
    * fill in real values and drop the `.example` suffix at deploy time.
    */
  val connections: Seq[ConnExample] = Seq(
    ConnExample("graft_recorder_kiel",
      "JWT basic-auth connection to the recording vendor API (site Kiel)",
      "https://recorder.example.org/api",
      "recorder-user-kiel", "recorder-pass-kiel",
      Seq("jwt_url" -> "https://recorder.example.org/token",
        "jwt_token_path" -> "token",
        "user_id" -> "recorder-kiel-uid")),
    ConnExample("graft_ucam_default",
      "JWT json-body connection to the device-assignment (UCAM) API",
      "https://assignments.example.org/api",
      "ucam-user", "ucam-pass",
      Seq("jwt_url" -> "https://assignments.example.org/token",
        "jwt_token_path" -> "data.token")),
    ConnExample("graft_dmp_default",
      "GraphQL signature-auth connection to the data-management portal",
      "https://portal.example.org/graphql",
      // the long public key lives in extra behind extra:// indirection —
      // the reference's escape hatch for the VARCHAR(500) login column
      // (connections.yaml.example:40-44); escape newlines as \\n
      "extra://public_key", "base64-signature-over-the-key",
      Seq("public_key" -> "-----BEGIN PUBLIC KEY-----\\nMIIB...\\n-----END PUBLIC KEY-----",
        "jwt_url" -> "https://portal.example.org/graphql",
        "jwt_token_path" -> "data.issueAccessToken.accessToken")))

  /** The dataset-mapping variable. The reference ships the key with a
    * `mapping`/`mappings` spelling drift between the example and the DAG
    * (variables.json.example:2 vs dags/dreem.py:169) — the engine fixes
    * one spelling and the loader below accepts only it.
    */
  val variables: Map[String, Map[String, String]] = Map(
    "dmp_dataset_mappings" -> Map(
      "TEST" -> "dataset-id-for-test-cohort",
      "COS" -> "dataset-id-for-cos-cohort"))

  def connectionsYamlExample: String = {
    val header =
      """# Example connections file, loaded once at first boot (a container
        |# that already initialized keeps its possibly-adjusted live values).
        |# Copy to connections.yaml and replace every placeholder.
        |""".stripMargin
    val blocks = connections.map { c =>
      val extraJson = c.extra.map { case (k, v) =>
        s"""      "$k": "$v"""" }.mkString("{\n", ",\n", "\n    }")
      s"""${c.name}:
         |  conn_type: JWT
         |  description: "${c.description}"
         |  host: ${c.host}
         |  login: ${c.login}
         |  password: ${c.password}
         |  extra: |
         |    $extraJson
         |  port: null
         |  schema: null
         |""".stripMargin
    }
    header + "\n" + blocks.mkString("\n")
  }

  def variablesJsonExample: String =
    MiniJson.render(MiniJson.JObj(
      scala.collection.immutable.VectorMap(variables.toSeq.sortBy(_._1).map {
        case (k, m) => k -> MiniJson.JObj(
          scala.collection.immutable.VectorMap(
            m.toSeq.sortBy(_._1).map { case (a, b) =>
              a -> MiniJson.JStr(b) }: _*))
      }: _*))) + "\n"

  /** Ledger-store bootstrap (the mongo-init.sh role): create the ledger
    * database user the Mongo-backed [[graft.ledger.MongoLedger]] connects
    * as. Credentials come from the container environment, same contract
    * as the reference script.
    */
  def mongoInitExample: String =
    """#!/bin/sh
      |# Ledger-store first-boot bootstrap: creates the read-write user the
      |# Mongo-backed ledger connects as. Runs once via the container's
      |# init hook; credentials come from the environment.
      |set -e
      |
      |mongosh <<EOF
      |use $LEDGER_DB
      |
      |db.createUser({
      |  user: '$LEDGER_USER',
      |  pwd: '$LEDGER_PASSWORD',
      |  roles: [{ role: 'readWrite', db: '$LEDGER_DB' }]
      |})
      |EOF
      |""".stripMargin

  /** Parse the flat YAML subset the connections example uses: top-level
    * `name:` blocks, two-space `key: value` fields, and a `key: |` block
    * literal whose body is the deeper-indented lines. Comments and null
    * fields are skipped. NOT a general YAML parser — it reads exactly
    * the shape [[connectionsYamlExample]] renders (and the reference
    * example shares), which the round-trip spec pins.
    */
  def parseConnectionsYaml(yaml: String): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    var blockKey: Option[String] = None
    val blockBuf = new StringBuilder
    def flushBlock(): Unit = blockKey.foreach { k =>
      out(current.get)(k) = blockBuf.toString.trim
      blockKey = None; blockBuf.clear()
    }
    yaml.linesIterator.foreach { raw =>
      val t = raw.trim
      if (blockKey.isDefined && (raw.startsWith("    ") || t.isEmpty)) {
        blockBuf.append(raw.drop(4)).append('\n')
      } else if (t.isEmpty || t.startsWith("#")) {
        // comment / blank outside a block
      } else if (!raw.startsWith(" ") && t.endsWith(":")) {
        flushBlock()
        val name = t.dropRight(1)
        current = Some(name)
        out(name) = scala.collection.mutable.LinkedHashMap.empty
      } else if (raw.startsWith("  ") && current.isDefined) {
        flushBlock()
        val i = t.indexOf(':')
        require(i > 0, s"unparseable field line: $raw")
        val k = t.take(i).trim
        val v = t.drop(i + 1).trim
        if (v == "|") { blockKey = Some(k) }
        else if (v != "null" && v.nonEmpty)
          out(current.get)(k) = v.stripPrefix("\"").stripSuffix("\"")
      } else require(false, s"unparseable line: $raw")
    }
    flushBlock()
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Build a [[ConnectionConfig]] from one parsed connection block —
    * the Connection→hook handoff (`jwt_url`/`jwt_token_path` ride the
    * extras, everything else is first-class).
    */
  def toConnectionConfig(fields: Map[String, String]): ConnectionConfig = {
    val extras: Map[String, String] = fields.get("extra") match {
      case None => Map.empty
      case Some(js) => MiniJson.parse(js) match {
        case MiniJson.JObj(m) => m.collect {
          case (k, MiniJson.JStr(s)) => k -> s }
        case other => throw new IllegalArgumentException(
          s"extra must be a JSON object, got $other")
      }
    }
    ConnectionConfig(
      host = fields.getOrElse("host",
        throw new NoSuchElementException("connection requires host")),
      login = fields.getOrElse("login", ""),
      password = fields.getOrElse("password", ""),
      jwtUrl = extras.getOrElse("jwt_url", ""),
      jwtTokenPath = extras.getOrElse("jwt_token_path", "token"),
      extras = extras)
  }

  /** Parse the variables example and return the dataset mapping (the
    * one variable the pipeline consumes, via `Stages.assignDataset`).
    */
  def parseVariablesJson(json: String): Map[String, Map[String, String]] =
    MiniJson.parse(json) match {
      case MiniJson.JObj(vars) => vars.map {
        case (k, MiniJson.JObj(m)) => k -> m.collect {
          case (a, MiniJson.JStr(b)) => a -> b }.toMap
        case (k, other) => throw new IllegalArgumentException(
          s"variable $k must be a string map, got $other")
      }.toMap
      case other => throw new IllegalArgumentException(
        s"variables file must be a JSON object, got $other")
    }

  /** Regenerate the on-disk init/ artifacts. */
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "init")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("connections.yaml.example"),
      connectionsYamlExample.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("variables.json.example"),
      variablesJsonExample.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("ledger-init.sh.example"),
      mongoInitExample.getBytes("UTF-8"))
    println(s"[init] wrote 3 example files under $dir")
  }
}
