package graft

import org.apache.spark.sql.functions._

import graft.ops.UrlOps

/** Round-10 URL hygiene: canonical-form contract pins (every rule, plus
  * the deliberate non-rules), suffix enumeration, and equivalence of the
  * row-local literal blocklist path vs the exploded equi-join path. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq

  test("canonicalizeUrl: case, default ports, fragments, tracking " +
    "params, param order, trailing slashes") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&b=2&a=1#f") ==
      Seq("https://www.ex.com/a/b?a=1&b=2"))
    assert(canon("http://H.io:80/") == Seq("http://h.io/"))
    // NON-default port survives, including 443 on http
    assert(canon("http://h.io:443/p") == Seq("http://h.io:443/p"))
    assert(canon("https://h.io:8080/p") == Seq("https://h.io:8080/p"))
    // all params tracking → '?' drops entirely
    assert(canon("http://h.io/p?utm_a=1&gclid=z&fbclid=q&ref=r") ==
      Seq("http://h.io/p"))
    // empty path → '/', multiple trailing slashes collapse
    assert(canon("http://h.io", "http://h.io///") ==
      Seq("http://h.io/", "http://h.io/"))
    // param sort is bytewise; '=' belongs to the param string
    assert(canon("http://h.io/?b=2&B=1") == Seq("http://h.io/?B=1&b=2"))
    // deliberately NOT done: path case-folding, percent-decoding
    assert(canon("http://h.io/CaseS%2Fkept?x=%41") ==
      Seq("http://h.io/CaseS%2Fkept?x=%41"))
  }

  test("hostOf and hostSuffixes enumerate every dot-suffix") {
    val got = Seq("http://A.B.example.ORG:8080/x?q=1")
      .toDF("u")
      .select(UrlOps.hostOf(col("u")).as("h"))
      .select(col("h"), UrlOps.hostSuffixes(col("h")).as("s"))
      .as[(String, Seq[String])].collect().head
    assert(got._1 == "a.b.example.org")
    assert(got._2 == Seq("a.b.example.org", "b.example.org",
      "example.org", "org"))
  }

  test("blockedBySuffix: exact host, parent suffix, no substring leaks") {
    val hosts = Seq("ads.tracker.net", "tracker.net", "nottracker.net",
      "tracker.net.evil.com", "safe.org").toDF("h")
    val got = hosts
      .select(col("h"), UrlOps.blockedBySuffix(col("h"),
        Seq("Tracker.NET")).as("b"))
      .as[(String, Boolean)].collect().toMap
    assert(got("ads.tracker.net"))            // parent suffix
    assert(got("tracker.net"))                // exact
    assert(!got("nottracker.net"))            // substring must NOT match
    assert(!got("tracker.net.evil.com"))      // prefix labels don't count
    assert(!got("safe.org"))
  }

  test("blocklistJoin agrees with the literal path and keeps " +
    "unparseable hosts unblocked") {
    val hosts = Seq("ads.tracker.net", "nottracker.net", "x.blog.ex.org",
      "blog.ex.org", "", "safe.org").toDF("host")
    val bl = Seq("tracker.net", "blog.ex.org").toDF("suffix")
    val joined = UrlOps.blocklistJoin(hosts, col("host"), bl)
      .as[(String, Boolean)].collect().toMap
    val literal = hosts.select(col("host"),
        UrlOps.blockedBySuffix(col("host"),
          Seq("tracker.net", "blog.ex.org")).as("b"))
      .as[(String, Boolean)].collect().toMap
    assert(joined == literal + ("" -> false)) // '' yields no suffix rows
    assert(joined("ads.tracker.net") && joined("blog.ex.org") &&
      joined("x.blog.ex.org"))
    assert(!joined("nottracker.net") && !joined("safe.org") && !joined(""))
    val ex = intercept[IllegalArgumentException] {
      UrlOps.blocklistJoin(hosts, col("host"),
        Seq(("a", 1)).toDF("suffix", "extra"))
    }
    assert(ex.getMessage.contains("suffix"))
  }
}
