package graft.connect

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Connector auth strategies — the Scala mirror of the reference's JWT-hook
  * subclass pattern (ideafast_etl/hooks/jwt.py:26-27,87-97: "If this is
  * different for your case, create a subclass and override").
  *
  * A provider owns: expiry check on the cached token (local decode of the
  * `exp` claim, jwt.py:105-115), refresh via a strategy-specific prepared
  * request (jwt.py:118-132), and persistence of the refreshed token through
  * a pluggable callback (the Airflow-Connection write-back, jwt.py:134-148).
  */
final case class ConnectionConfig(
    host: String,
    login: String = "",
    password: String = "",
    jwtUrl: String = "",
    jwtTokenPath: String = "token",
    jwtToken: Option[String] = None,
    /** Free-form connection extras (the Airflow `extra` dict, jwt.py:157+);
      * long credentials can live here behind `extra://<key>` indirection
      * (dmp.py:41-47).
      */
    extras: Map[String, String] = Map.empty) {
  require(host.nonEmpty, "connection requires host")
}

object Jwt {
  /** Extract the `exp` epoch-seconds claim from an (unverified) JWT — the
    * only claim the reference checks (jwt.py:105-115).
    */
  def expiry(token: String): Option[Long] = {
    val parts = token.split('.')
    if (parts.length < 2) return None
    try {
      val payload = new String(Base64.getUrlDecoder.decode(parts(1)),
        StandardCharsets.UTF_8)
      """"exp"\s*:\s*(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)
    } catch { case _: IllegalArgumentException => None }
  }

  def isExpired(token: String, nowEpochSec: Long): Boolean =
    expiry(token).forall(_ <= nowEpochSec)

  /** F11 — dot-path navigation (`a.b.[1].c`) through a parsed JSON tree,
    * mirroring `_find_jwt_token`/`get_despite_none` (jwt.py:59-85):
    * None-safe descent, list indexing, error when the path is absent.
    */
  def dotPath(json: String, path: String): Option[String] = {
    val tree = MiniJson.parse(json)
    val segs = path.split('.')
    val out = segs.foldLeft(Option(tree)) {
      case (Some(MiniJson.JArr(items)), seg) if seg.matches("""\[\d+\]""") =>
        val i = seg.stripPrefix("[").stripSuffix("]").toInt
        if (i < items.length) Some(items(i)) else None
      case (Some(MiniJson.JObj(fields)), seg) => fields.get(seg)
      case _ => None
    }
    out.collect {
      case MiniJson.JStr(s) => s
      case MiniJson.JNum(n) => n
      case MiniJson.JBool(b) => b.toString
    }
  }
}

trait TokenProvider extends Serializable {
  protected def transport: Transport
  protected def conn: ConnectionConfig
  /** Strategy override point: the refresh request (jwt.py:87-97). */
  protected def prepareRefreshRequest(): HttpRequest
  /** Persistence hook (the Connection write-back). */
  protected def persist(token: String): Unit = ()

  @volatile private var cached: Option[String] = conn.jwtToken

  def nowEpochSec(): Long = System.currentTimeMillis() / 1000

  /** Valid bearer token, refreshing if absent/expired. */
  def token(): String = synchronized {
    cached.filterNot(Jwt.isExpired(_, nowEpochSec())).getOrElse {
      val resp = transport.send(prepareRefreshRequest())
      require(resp.isSuccess, s"token refresh failed: HTTP ${resp.status}")
      val t = Jwt.dotPath(resp.bodyString, conn.jwtTokenPath)
        .getOrElse(throw new NoSuchElementException(
          s"token path '${conn.jwtTokenPath}' not found in refresh response"))
      cached = Some(t)
      persist(t)
      t
    }
  }

  def authHeader(): Map[String, String] = Map("Authorization" -> s"Bearer ${token()}")
}

/** HTTP basic-auth refresh (the JwtHook default, jwt.py:87-97). */
class BasicAuthTokenProvider(val transport: Transport,
                             val conn: ConnectionConfig) extends TokenProvider {
  override protected def prepareRefreshRequest(): HttpRequest = {
    val cred = Base64.getEncoder.encodeToString(
      s"${conn.login}:${conn.password}".getBytes(StandardCharsets.UTF_8))
    HttpRequest("POST", conn.jwtUrl, Map("Authorization" -> s"Basic $cred"))
  }
}

/** JSON `{Username, Password}` body refresh (the UcamHook override,
  * ucam.py:89-93). Credentials are serialized through MiniJson so quotes /
  * backslashes in them cannot break the JSON or inject fields.
  */
class JsonBodyTokenProvider(val transport: Transport,
                            val conn: ConnectionConfig) extends TokenProvider {
  override protected def prepareRefreshRequest(): HttpRequest =
    HttpRequest("POST", conn.jwtUrl,
      Map("Content-Type" -> "application/json"),
      MiniJson.render(MiniJson.JObj(scala.collection.immutable.VectorMap(
        "Username" -> MiniJson.JStr(conn.login),
        "Password" -> MiniJson.JStr(conn.password))))
        .getBytes(StandardCharsets.UTF_8))
}

/** GraphQL signature-auth refresh — the DmpHook override (dmp.py:37-57):
  * POST `{query: <token mutation>, variables: {pubkey, signature}}` to the
  * token endpoint. A login of the form `extra://<key>` is resolved through
  * the connection extras, the reference's escape hatch for storing long
  * public keys outside the user field (dmp.py:41-47).
  */
class SignatureAuthTokenProvider(val transport: Transport,
                                 val conn: ConnectionConfig) extends TokenProvider {
  /** The token-issuance GraphQL document (the reference ships it as the
    * dmpy `token.graphql` resource, dmp.py:50).
    */
  val tokenQuery: String =
    """mutation issueAccessToken($pubkey: String!, $signature: String!) {
      |  issueAccessToken(pubkey: $pubkey, signature: $signature) {
      |    accessToken
      |  }
      |}""".stripMargin

  private val extraPrefix = "extra://"

  private[connect] def resolvedPubkey: String =
    if (conn.login.startsWith(extraPrefix))
      conn.extras.getOrElse(conn.login.drop(extraPrefix.length),
        throw new NoSuchElementException(
          s"extras key '${conn.login.drop(extraPrefix.length)}' not found"))
    else conn.login

  override protected def prepareRefreshRequest(): HttpRequest =
    HttpRequest("POST", conn.jwtUrl,
      Map("Content-Type" -> "application/json"),
      MiniJson.render(MiniJson.JObj(scala.collection.immutable.VectorMap(
        "query" -> MiniJson.JStr(tokenQuery),
        "variables" -> MiniJson.JObj(scala.collection.immutable.VectorMap(
          "pubkey" -> MiniJson.JStr(resolvedPubkey),
          "signature" -> MiniJson.JStr(conn.password))))))
        .getBytes(StandardCharsets.UTF_8))
}

/** Tiny recursive-descent JSON reader (driver-side config parsing only — no
  * dataflow use; dataflow JSON goes through get_json_object/Catalyst).
  */
object MiniJson {
  sealed trait J
  final case class JObj(fields: Map[String, J]) extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(n: String) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  def parse(s: String): J = { val p = new P(s); val v = p.value(); p.ws(); v }

  /** Compact re-serialization (used by the DSv2 source to emit result
    * objects as JSON-string rows). Field order is preserved from parse.
    */
  def render(j: J): String = j match {
    case JObj(fields) =>
      fields.map { case (k, v) => s"${renderStr(k)}:${render(v)}" }
        .mkString("{", ",", "}")
    case JArr(items) => items.map(render).mkString("[", ",", "]")
    case JStr(s) => renderStr(s)
    case JNum(n) => n
    case JBool(b) => b.toString
    case JNull => "null"
  }

  private def renderStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    private def fail(msg: String) =
      throw new IllegalArgumentException(s"json parse error at $i: $msg")
    // bounds-checked cursor read: truncated input must surface as the
    // documented IllegalArgumentException (callers catch that), never a
    // raw StringIndexOutOfBoundsException escaping the parser
    private def at(j: Int): Char =
      if (j < s.length) s(j) else fail("eof")
    def value(): J = {
      ws()
      if (i >= s.length) fail("eof")
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => num()
      }
    }
    private def lit(l: String): Unit =
      if (s.startsWith(l, i)) i += l.length else fail(s"expected $l")
    private def num(): J = {
      val start = i
      while (i < s.length && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      if (i == start) fail("expected value")
      JNum(s.substring(start, i))
    }
    private def str(): String = {
      i += 1; val sb = new StringBuilder
      while (at(i) != '"') {
        if (at(i) == '\\') {
          i += 1
          at(i) match {
            case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
            case 'u' =>
              if (i + 5 > s.length) fail("eof in unicode escape")
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => sb += c
          }
        } else sb += at(i)
        i += 1
      }
      i += 1; sb.toString
    }
    private def obj(): J = {
      i += 1; ws()
      if (at(i) == '}') { i += 1; return JObj(Map.empty) }
      val fields = scala.collection.mutable.LinkedHashMap.empty[String, J]
      while (true) {
        ws(); val k = str(); ws()
        if (at(i) != ':') fail("expected :"); i += 1
        fields(k) = value(); ws()
        if (at(i) == ',') i += 1
        else if (at(i) == '}') { i += 1; return JObj(scala.collection.immutable.VectorMap.from(fields)) }
        else fail("expected , or }")
      }
      JObj(scala.collection.immutable.VectorMap.from(fields))
    }
    private def arr(): J = {
      i += 1; ws()
      if (at(i) == ']') { i += 1; return JArr(Vector.empty) }
      val items = Vector.newBuilder[J]
      while (true) {
        items += value(); ws()
        if (at(i) == ',') i += 1
        else if (at(i) == ']') { i += 1; return JArr(items.result()) }
        else fail("expected , or ]")
      }
      JArr(items.result())
    }
  }
}
