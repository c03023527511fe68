package graft

import org.apache.spark.sql.functions.col

import graft.functions.UrlFunctions

class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("scheme/host lower-cased, default port stripped, tracking params removed") {
    assert(norm("HTTP://Example.COM:80/p/3?utm_source=feed&id=7")
      == Seq("http://example.com/p/3?id=7"))
    assert(norm("https://CDN.Site.org:443/img/9#frag")
      == Seq("https://cdn.site.org/img/9"))
  }

  test("non-default ports and path case are preserved") {
    assert(norm("http://a.b:8080/Path/File") == Seq("http://a.b:8080/Path/File"))
    // :443 is only default for https — preserved on http
    assert(norm("http://a.b:443/x") == Seq("http://a.b:443/x"))
  }

  test("tracking params removed mid-query with separator repair") {
    assert(norm("https://a.b/p?id=1&utm_b=2&q=3") == Seq("https://a.b/p?id=1&q=3"))
    assert(norm("https://a.b/p?utm_a=1&utm_b=2") == Seq("https://a.b/p"))
    assert(norm("https://a.b/p?fbclid=xyz&id=1") == Seq("https://a.b/p?id=1"))
  }

  test("bare slash path collapses; other trailing slashes kept") {
    assert(norm("https://A.B/") == Seq("https://a.b"))
    assert(norm("https://a.b/x/?utm_a=1") == Seq("https://a.b/x/"))
  }

  test("non-URL strings fall back to lower(trim)") {
    assert(norm("  Not A Url  ") == Seq("not a url"))
  }

  test("'&' in the PATH is raw data — tracking strip touches only the query string") {
    // '&utm_campaign=raw/y' here is part of the path, not a parameter
    assert(norm("https://a.b/x&utm_campaign=raw/y")
      == Seq("https://a.b/x&utm_campaign=raw/y"))
    assert(norm("https://a.b/x&&y/z?utm_a=1") == Seq("https://a.b/x&&y/z"))
  }

  test("other schemes pass through with case normalization only") {
    assert(norm("FTP://Files.NET:80/a") == Seq("ftp://files.net:80/a"))
  }

  test("normalization is idempotent over a generated URL corpus") {
    // canonical forms must be fixed points — a second pass that
    // changes anything means dedup keys drift between pipeline stages
    val schemes = Seq("http", "HTTPS", "ftp")
    val hosts = Seq("A.b", "x.Y.z:443", "h.io:80", "plain")
    val paths = Seq("", "/", "/P/q", "/x&utm_a=1/y")
    val queries = Seq("", "?id=1", "?utm_a=1", "?utm_a=1&id=2&fbclid=z", "?a=1&&b=2&")
    val frags = Seq("", "#f")
    val urls = for (s <- schemes; h <- hosts; p <- paths; q <- queries; f <- frags)
      yield s"$s://$h$p$q$f"
    val once = norm(urls: _*)
    val twice = once.flatMap(u => norm(u))
    for (((u, a), b) <- urls.zip(once).zip(twice))
      assert(a == b, s"not idempotent for '$u': '$a' -> '$b'")
  }

  test("domainBlocked: label-boundary suffix match only — no substring false positives") {
    import spark.implicits._
    val blocked = Seq("tracker.example.com", "bad.org")
    val cases = Seq(
      ("https://tracker.example.com/x", true),       // exact
      ("https://ads.tracker.example.com/x", true),   // subdomain
      ("http://SUB.BAD.ORG:8080/y?z=1", true),       // case + port + deeper
      ("https://www.example.com/x", false),          // parent of a blocked sub
      ("https://nottracker.example.com/x", false),   // substring near-miss
      ("https://notbad.org/x", false),               // substring near-miss
      ("https://bad.org.evil.net/x", false),         // blocked string as PREFIX
      ("https://good.net/x", false))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), UrlFunctions.domainBlocked(col("url"), blocked).as("b"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((u, exp) <- cases)
      assert(out(u) === exp, s"$u expected blocked=$exp")
  }

  test("urlHost: lowercases and strips ports") {
    import spark.implicits._
    val out = Seq("HTTPS://WWW.Example.COM:8443/p", "http://h.io/x")
      .toDF("url").select(UrlFunctions.urlHost(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("www.example.com", "h.io"))
  }
}
