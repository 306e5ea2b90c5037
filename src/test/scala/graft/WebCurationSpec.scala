package graft

import org.apache.spark.sql.functions._

import graft.operators.WebCuration
import graft.operators.WebCuration.PslRule

/** URL canonicalization + public-suffix registrable-domain extraction +
  * domain filter/quota operators. The PSL algorithm cases mirror the
  * shapes of the publicsuffix.org test vectors (plain, multi-label,
  * wildcard, exception, default rule, host-is-suffix). */
class WebCurationSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url")
      .select(WebCuration.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
  }

  test("canonicalizeUrl: case, default port, empty path, fragment") {
    assert(canon("HTTP://WWW.Example.COM") == Seq("http://www.example.com/"))
    assert(canon("http://www.example.com:80/") ==
      Seq("http://www.example.com/"))
    assert(canon("https://www.example.com:443/a") ==
      Seq("https://www.example.com/a"))
    assert(canon("https://www.example.com:80/a") ==
      Seq("https://www.example.com:80/a")) // 80 is NOT the https default
    assert(canon("http://h.io:08080/x") == Seq("http://h.io:8080/x"))
    assert(canon("http://h.io/a/b#frag") == Seq("http://h.io/a/b"))
    // path case is preserved (RFC 3986: only scheme+host case-normalize)
    assert(canon("http://h.io/A/B") == Seq("http://h.io/A/B"))
  }

  test("canonicalizeUrl: query sort, empty query, duplicate keys") {
    assert(canon("http://h.io/p?b=2&a=1") == Seq("http://h.io/p?a=1&b=2"))
    assert(canon("http://h.io/p?a=1&b=2") == Seq("http://h.io/p?a=1&b=2"))
    assert(canon("http://h.io/p?") == Seq("http://h.io/p"))
    assert(canon("http://h.io/p?b=1&a=2&a=1") ==
      Seq("http://h.io/p?a=1&a=2&b=1"))
    assert(canon("http://h.io?x=1#f") == Seq("http://h.io/?x=1"))
  }

  test("canonicalizeUrl: malformed / non-absolute URLs go to NULL, " +
    "never to shared degenerate keys") {
    import spark.implicits._
    val bad = Seq("relative/path", "//proto.relative/x", "h.io/x",
      "http://h.io:99999999999999999999/x", "http://h.io:65536/",
      "http:///nohost", "", "   ")
    val out = bad.toDF("url")
      .select(WebCuration.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.forall(_.isEmpty), s"malformed urls canonicalized: " +
      s"${bad.zip(out).filter(_._2.nonEmpty)}")
    // boundary: 65535 is a valid port, leading zeros strip
    assert(canon("http://h.io:65535/x") == Seq("http://h.io:65535/x"))
    assert(canon("http://h.io:00080/x") == Seq("http://h.io/x"))
    // urlDedup drops the dead-letter rows instead of merging them
    val mixed = Seq((1L, "http://a.io/x"), (2L, "junk"),
      (3L, "also junk"), (4L, "HTTP://A.io/x")).toDF("id", "url")
    val groups = WebCuration.urlDedup(mixed, "url", "id").collect()
    assert(groups.length == 1 && groups.head.getLong(2) == 2L,
      s"malformed rows leaked into dedup groups: ${groups.toSeq}")
  }

  test("parsePsl: comments, markers, inline whitespace") {
    val rules = WebCuration.parsePsl(Iterator(
      "// comment", "", "com", "  co.uk  ", "*.ck", "!www.ck",
      "GitHub.IO trailing-garbage"))
    assert(rules == Seq(
      PslRule("com", isWildcard = false, isException = false),
      PslRule("co.uk", isWildcard = false, isException = false),
      PslRule("ck", isWildcard = true, isException = false),
      PslRule("www.ck", isWildcard = false, isException = true),
      PslRule("github.io", isWildcard = false, isException = false)))
    assert(rules(1).labelCount == 2)
  }

  private def domains(hosts: String*): Seq[Option[String]] = {
    import spark.implicits._
    hosts.toDF("host")
      .select(WebCuration.registrableDomain(col("host")).as("d"))
      .collect().toSeq.map(r => Option(r.getString(0)))
  }

  test("registrableDomain: plain, multi-label, private-registry rules") {
    assert(domains("www.example.com") == Seq(Some("example.com")))
    assert(domains("a.b.c.example.com") == Seq(Some("example.com")))
    assert(domains("blog.example.co.uk") == Seq(Some("example.co.uk")))
    // github.io is itself a (private-section) suffix → eTLD+1 is user.io
    assert(domains("pages.alpha.github.io") == Seq(Some("alpha.github.io")))
    assert(domains("x.blogspot.com") == Seq(Some("x.blogspot.com")))
  }

  test("registrableDomain: wildcard, exception, default, host=suffix") {
    // wildcard *.ck: bar.ck is a public suffix → foo.bar.ck registrable
    assert(domains("foo.bar.ck") == Seq(Some("foo.bar.ck")))
    assert(domains("deep.foo.bar.ck") == Seq(Some("foo.bar.ck")))
    // exception !www.ck prevails over *.ck → www.ck itself registrable
    assert(domains("www.ck") == Seq(Some("www.ck")))
    assert(domains("sub.www.ck") == Seq(Some("www.ck")))
    // no rule matches → default rule `*` (last label is the suffix,
    // so the registrable domain keeps the last TWO labels)
    assert(domains("host.unlisted-tld") == Seq(Some("host.unlisted-tld")))
    assert(domains("a.host.unlisted-tld") == Seq(Some("host.unlisted-tld")))
    // host IS a public suffix → nothing registered → null
    assert(domains("com", "co.uk", "github.io", "bar.ck") ==
      Seq(None, None, None, None))
  }

  test("registrableDomain: mixed-case hosts case-normalize instead of " +
    "silently missing every rule probe") {
    // before the fix a mixed-case host fell through to the default `*`
    // rule (wrong eTLD+1, no error); both kernel and Column twin now
    // lowercase internally
    assert(domains("WWW.Example.COM", "Blog.Example.CO.UK", "Foo.Bar.CK",
      "SUB.WWW.CK", "CO.UK") ==
      Seq(Some("example.com"), Some("example.co.uk"), Some("foo.bar.ck"),
        Some("www.ck"), None))
    import spark.implicits._
    val r = Seq("Blog.Example.CO.UK").toDF("host")
      .select(WebCuration.registrableDomainColumnForm(col("host")).as("d"))
      .collect().head.getString(0)
    assert(r == "example.co.uk", s"Column twin skipped case-norm: $r")
  }

  test("registrableDomain: custom rule set and depth guard") {
    val psl = Seq(PslRule("com", false, false))
    import spark.implicits._
    val got = Seq("x.y.com").toDF("host")
      .select(WebCuration.registrableDomain(col("host"), psl).as("d"))
      .collect().head.getString(0)
    assert(got == "y.com")
    intercept[IllegalArgumentException] {
      WebCuration.registrableDomain(col("host"), psl, maxDepth = 0)
    }
  }

  test("registrableDomain: native kernel == Column twin on every host " +
    "shape (incl. synthetic corpus hosts)") {
    import spark.implicits._
    val hosts = Seq(
      "www.example.com", "a.b.c.example.com", "blog.example.co.uk",
      "pages.alpha.github.io", "x.blogspot.com", "foo.bar.ck",
      "deep.foo.bar.ck", "www.ck", "sub.www.ck", "host.unlisted-tld",
      "a.host.unlisted-tld", "com", "co.uk", "github.io", "bar.ck",
      "single", "a.b.c.d.e.f.g.co.uk")
    val df = hosts.toDF("host")
    val both = df.select(
        WebCuration.registrableDomain(col("host")).as("kernel"),
        WebCuration.registrableDomainColumnForm(col("host")).as("twin"))
      .collect()
    both.zip(hosts).foreach { case (r, h) =>
      assert(Option(r.getString(0)) == Option(r.getString(1)),
        s"kernel/twin disagree on $h: ${r.getString(0)} vs " +
          s"${r.getString(1)}")
    }
  }

  test("urlDedup merges case/port/query-order/fragment variants") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTP://A.com/x?b=2&a=1#f"),
      (2L, "http://a.com:80/x?a=1&b=2"),
      (3L, "http://a.com/x?a=1&b=2"),
      (4L, "http://a.com/y")).toDF("id", "url")
    val out = WebCuration.urlDedup(df, "url", "id")
      .orderBy("canonical_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "http://a.com/x?a=1&b=2")
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 3L)
    assert(out(1).getString(0) == "http://a.com/y")
    assert(out(1).getLong(1) == 4L && out(1).getLong(2) == 1L)
  }

  test("urlFunnel: exact drop accounting across the parse/dedup funnel") {
    import spark.implicits._
    val df = Seq(
      "http://a.io/x", "HTTP://A.io/x#f", // 2 rows, 1 canonical
      "https://b.io/", "relative/junk", "//no.scheme/x").toDF("url")
    val r = WebCuration.urlFunnel(df, "url").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((5L, 3L, 2L, 2L, 1L)),
      s"funnel counts wrong: $r")
  }

  test("domainFilter: blocklist, allowlist, null domains dropped") {
    import spark.implicits._
    val df = Seq(("a.com", 1), ("b.com", 2), (null: String, 3),
      ("c.org", 4)).toDF("domain", "v")
    assert(WebCuration.domainFilter(df, "domain", Seq("B.COM"))
      .select("v").as[Int].collect().sorted.toSeq == Seq(1, 4))
    assert(WebCuration.domainFilter(df, "domain", Seq("b.com"),
        allowed = Some(Seq("a.com")))
      .select("v").as[Int].collect().toSeq == Seq(1))
  }

  test("domainQuotaCap: deterministic per-domain cap") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (if (i % 2 == 0) "a.com" else "b.org", i))
      .toDF("domain", "id")
    val out = WebCuration.domainQuotaCap(df, "domain", "id", quota = 5)
    val perDomain = out.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perDomain == Map("a.com" -> 5L, "b.org" -> 5L))
    // deterministic: same draw on re-run
    val ids1 = out.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = WebCuration.domainQuotaCap(df, "domain", "id", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }
}
