package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.WebCuration

/** URL / domain-level curation queries (the C4/RefinedWeb web-pipeline
  * family) over `documents`. The test table carries no URL column, so
  * each query derives one deterministically from md5(doc_id) — mixed
  * radix digits pick host / scheme / port / path / query / fragment
  * variants, identically in Spark and in the DuckDB oracle (the house
  * q85/q86 h60 construction). The variant space is built so that
  * canonicalization MERGES rows (case, default ports, query order,
  * fragments) and the host list walks every public-suffix-list rule
  * shape (plain, multi-label, private-registry, wildcard, exception).
  */
object WebQueries {

  // hosts: 14 raw forms → 12 canonical hosts → 8 registrable domains.
  // Indices 0/1 differ only by case; 10/11 share a domain with distinct
  // hosts; 8 hits the PSL exception rule (!www.ck), 9 the wildcard
  // (*.ck), 6/7 the private-registry suffix (github.io); 12/13 are IDN
  // twins merging via punycode ToASCII.
  // indices 12/13 (r14): IDN TWINS — the unicode host and its punycode
  // form must merge onto one canonical host (and PSL domain) after the
  // kernel's ToASCII pass; the oracle's mapping is hand-derived (the
  // RFC 3492 worked example bücher → bcher-kva), not a kernel port
  private val hosts = Seq(
    "www.example.com", "WWW.Example.COM", "news.example.com",
    "blog.example.co.uk", "Sub.Blog.Example.co.uk", "docs.example.org",
    "alpha.github.io", "beta.github.io", "www.ck", "foo.bar.ck",
    "cdn.example.net", "static.example.net",
    "bücher.example.com", "xn--bcher-kva.example.com")
  private val schemes = Seq("http", "HTTP", "https", "HTTPS")
  // three pct-encoded forms (r13): `/a%2fb` and `/a%2Fb` merge (hex-case
  // normalization), `/x%41y` decodes to `/xAy` (unreserved decode) —
  // the §6.2.2.2 rules promoted from spec-only to oracle-gated
  private val paths = Seq("", "/", "/a/b", "/a/B", "/index.html",
    "/a%2fb", "/a%2Fb", "/x%41y")
  // userinfo variants (r13): half the rows carry RFC 3986 userinfo and
  // must merge onto their bare-host twins
  private val userinfos = Seq("", "", "u@", "u:p@")

  /** Spark-side URL synthesis. Each variant digit comes from its OWN
    * md5-hex substring (host 15 hex chars, scheme/path/port 4, query 3,
    * fragment/userinfo 1 each) — disjoint substrings, exact long
    * arithmetic in both engines. (A single 60-bit int with `h / radix`
    * digit extraction is NOT portable: Spark's `Column./` on longs is
    * DOUBLE division, and above 2^53 the quotient loses bits.) */
  private[queries] def synthUrl: Column = {
    val d = md5(col("doc_id").cast("string"))
    def hex(pos: Int, len: Int): Column =
      conv(substring(d, pos, len), 16, 10).cast("long")
    val host = element_at(array(hosts.map(lit): _*),
      (hex(1, 15) % hosts.size).cast("int") + 1)
    val scheme = element_at(array(schemes.map(lit): _*),
      (hex(16, 4) % 4).cast("int") + 1)
    val path = element_at(array(paths.map(lit): _*),
      (hex(20, 4) % 8).cast("int") + 1)
    val portSel = hex(24, 4) % 3
    val port = when(portSel === 1,
        when(lower(scheme) === "http", lit(":80")).otherwise(lit(":443")))
      .when(portSel === 2, lit(":8080"))
      .otherwise(lit(""))
    val qSel = hex(28, 3) % 4
    val query = when(qSel === 1, lit("?b=2&a=1"))
      .when(qSel === 2, lit("?a=1&b=2"))
      .when(qSel === 3, lit("?b=2&a=%31")) // pct-encoded '1' → merges
      .otherwise(lit(""))
    val frag = when(hex(31, 1) % 2 === 1, lit("#sec")).otherwise(lit(""))
    val userinfo = element_at(array(userinfos.map(lit): _*),
      (hex(32, 1) % 4).cast("int") + 1)
    concat(scheme, lit("://"), userinfo, host, port, path, query, frag)
  }

  /** DuckDB-side synthesis of the same URL (list-literal indexing over
    * the same per-digit md5 substrings). */
  private[queries] val synthUrlSql: String = {
    def arr(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("([", ", ", "])")
    def hex(pos: Int, len: Int) =
      s"CAST(concat('0x', substr(d, $pos, $len)) AS BIGINT)"
    s"""WITH hh AS (
       |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS d
       |  FROM documents),
       |uu AS (
       |  SELECT doc_id,
       |    ${arr(schemes)}[CAST(${hex(16, 4)} % 4 AS INT) + 1] ||
       |    '://' ||
       |    ${arr(userinfos)}[CAST(${hex(32, 1)} % 4 AS INT) + 1] ||
       |    ${arr(hosts)}[CAST(${hex(1, 15)} % ${hosts.size} AS INT) + 1] ||
       |    CASE ${hex(24, 4)} % 3
       |         WHEN 1 THEN CASE WHEN lower(${arr(schemes)}[
       |             CAST(${hex(16, 4)} % 4 AS INT) + 1]) = 'http'
       |           THEN ':80' ELSE ':443' END
       |         WHEN 2 THEN ':8080' ELSE '' END ||
       |    ${arr(paths)}[CAST(${hex(20, 4)} % 8 AS INT) + 1] ||
       |    CASE ${hex(28, 3)} % 4
       |         WHEN 1 THEN '?b=2&a=1' WHEN 2 THEN '?a=1&b=2'
       |         WHEN 3 THEN '?b=2&a=%31'
       |         ELSE '' END ||
       |    CASE WHEN ${hex(31, 1)} % 2 = 1 THEN '#sec' ELSE '' END
       |    AS url
       |  FROM hh)""".stripMargin
  }

  /** DuckDB canonicalization of `url` (mirrors
    * [[WebCuration.canonicalizeUrl]]); defines CTE `canon(doc_id,
    * scheme, host, canonical_url)`. Userinfo strips at the last `@` of
    * the authority; the pct-normalization ground truth for the three
    * encoded path forms and the `%31` query form is HAND-DERIVED per
    * RFC 3986 §6.2.2.2 (a CASE over the fixed variant list — the
    * domainCaseSql pattern), deliberately NOT a port of the Scala
    * kernel. */
  private[queries] val canonSql: String =
    """cparts AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    regexp_replace(
      |      lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
      |      '^.*@', '') AS hostport,
      |    CASE regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
      |         WHEN '/a%2fb' THEN '/a%2Fb'
      |         WHEN '/x%41y' THEN '/xAy'
      |         ELSE regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
      |         END AS rawpath,
      |    replace(regexp_extract(regexp_replace(url, '#.*$', ''),
      |      '\?([^#]*)', 1), '%31', '1') AS rawq
      |  FROM uu),
      |canon AS (
      |  SELECT doc_id, scheme,
      |    replace(regexp_extract(hostport, '^([^:]*)', 1),
      |      'bücher.', 'xn--bcher-kva.') AS host,
      |    scheme || '://' ||
      |    replace(regexp_extract(hostport, '^([^:]*)', 1),
      |      'bücher.', 'xn--bcher-kva.') ||
      |    CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) = ''
      |           THEN ''
      |         WHEN CAST(regexp_extract(hostport, ':([0-9]+)$', 1) AS INT)
      |           = CASE scheme WHEN 'http' THEN 80 WHEN 'https' THEN 443
      |             ELSE -1 END THEN ''
      |         ELSE ':' || CAST(CAST(regexp_extract(hostport,
      |           ':([0-9]+)$', 1) AS INT) AS VARCHAR) END ||
      |    CASE WHEN rawpath = '' THEN '/' ELSE rawpath END ||
      |    CASE WHEN rawq = '' THEN ''
      |         ELSE '?' || array_to_string(list_sort(
      |           string_split(rawq, '&')), '&') END
      |    AS canonical_url
      |  FROM cparts)""".stripMargin

  /** Hand-derived PSL ground truth for the 11 canonical hosts — an
    * oracle INDEPENDENT of the Scala algorithm (the algorithm itself is
    * additionally pinned against publicsuffix.org test vectors in
    * WebCurationSpec). */
  private[queries] val domainCaseSql: String =
    """CASE host
      |  WHEN 'www.example.com'        THEN 'example.com'
      |  WHEN 'news.example.com'       THEN 'example.com'
      |  WHEN 'blog.example.co.uk'     THEN 'example.co.uk'
      |  WHEN 'sub.blog.example.co.uk' THEN 'example.co.uk'
      |  WHEN 'docs.example.org'       THEN 'example.org'
      |  WHEN 'alpha.github.io'        THEN 'alpha.github.io'
      |  WHEN 'beta.github.io'         THEN 'beta.github.io'
      |  WHEN 'www.ck'                 THEN 'www.ck'
      |  WHEN 'foo.bar.ck'             THEN 'foo.bar.ck'
      |  WHEN 'cdn.example.net'        THEN 'example.net'
      |  WHEN 'static.example.net'     THEN 'example.net'
      |  WHEN 'xn--bcher-kva.example.com' THEN 'example.com'
      |END""".stripMargin

  private val blocked = Seq("beta.github.io", "example.net")

  // --------------------------------------------------------------- q133
  // Canonical-URL exact dedup: ~33k raw URL variants collapse to ≤ 576
  // canonical groups (case, default-port, query-order, fragment,
  // userinfo, pct-encoding, and IDN/punycode merges; path case and
  // :8080 stay distinct). Output is one row per canonical URL with the
  // min-id survivor — the C4-style "keep one page per URL" pass.
  private def q133(s: SparkSession, dir: String): DataFrame =
    WebCuration.urlDedup(
        Tables.documents(s, dir).withColumn("url", synthUrl),
        "url", "doc_id")
      .orderBy(col("canonical_url"))

  private val q133Sql =
    s"""$synthUrlSql,
       |$canonSql
       |SELECT canonical_url, min(doc_id) AS survivor_id,
       |  count(*) AS n_dups
       |FROM canon
       |GROUP BY canonical_url
       |ORDER BY canonical_url""".stripMargin

  // --------------------------------------------------------------- q134
  // Registrable-domain rollup behind a blocklist: canonical host → PSL
  // eTLD+1 (wildcard *.ck, exception !www.ck, private-registry
  // github.io all exercised) → drop blocklisted domains → per-domain
  // doc and distinct-host counts.
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val withDomain = Tables.documents(s, dir)
      .withColumn("url", synthUrl)
      .withColumn("host", WebCuration.urlHost(col("url")))
      .withColumn("domain", WebCuration.registrableDomain(col("host")))
    WebCuration.domainFilter(withDomain, "domain", blocked)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))
      .orderBy(col("domain"))
  }

  private val q134Sql =
    s"""$synthUrlSql,
       |$canonSql,
       |dom AS (
       |  SELECT doc_id, host, $domainCaseSql AS domain
       |  FROM canon)
       |SELECT domain, count(*) AS n_docs,
       |  count(DISTINCT host) AS n_hosts
       |FROM dom
       |WHERE domain IS NOT NULL
       |  AND domain NOT IN (${blocked.map(b => s"'$b'").mkString(", ")})
       |GROUP BY domain
       |ORDER BY domain""".stripMargin

  // --------------------------------------------------------------- q135
  // Per-domain quota cap: at most 25 docs per registrable domain by the
  // deterministic md5-of-id draw — the RefinedWeb "cap any single
  // domain's share of the corpus" pass. Fixed 8×25-row output at every
  // scale ≥ sf0.001.
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val withDomain = Tables.documents(s, dir)
      .withColumn("url", synthUrl)
      .withColumn("domain",
        WebCuration.registrableDomain(WebCuration.urlHost(col("url"))))
    WebCuration.domainQuotaCap(withDomain, "domain", "doc_id", quota = 25)
      .select(col("domain"), col("doc_id"), col("sample_rank"))
      .orderBy(col("domain"), col("sample_rank"))
  }

  private val q135Sql =
    s"""$synthUrlSql,
       |$canonSql,
       |dom AS (
       |  SELECT doc_id, $domainCaseSql AS domain
       |  FROM canon),
       |rk AS (
       |  SELECT domain, doc_id, row_number() OVER (PARTITION BY domain
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
       |    AS sample_rank
       |  FROM dom)
       |SELECT domain, doc_id, sample_rank
       |FROM rk WHERE sample_rank <= 25
       |ORDER BY domain, sample_rank""".stripMargin

  // --------------------------------------------------------------- q137
  // URL funnel with a DETERMINISTIC malformed slice: ~15% of rows (60-bit
  // host digit mod 1000 < 150) lose their `scheme://` prefix — the
  // relative-href shape a real crawl feed contains — and must land in
  // dead_letter, never merge onto a degenerate key. The oracle derives
  // the malformed set INDEPENDENTLY (the digit rule, not the Scala
  // validity check), so a hash match proves canonicalizeUrl's
  // non-absolute-URL detection cross-engine, row-exactly, at every
  // scale — the spec-only NULL semantics promoted to a gate.
  private def q137(s: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
      16, 10).cast("long")
    val url = when(h % 1000 < 150,
        regexp_replace(synthUrl, "^[A-Za-z]+://", ""))
      .otherwise(synthUrl)
    WebCuration.urlFunnel(
      Tables.documents(s, dir).withColumn("url", url), "url")
  }

  private val q137Sql =
    s"""$synthUrlSql,
       |uu2 AS (
       |  SELECT u.doc_id,
       |    CASE WHEN CAST(concat('0x', substr(md5(CAST(u.doc_id AS
       |        VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 150
       |      THEN regexp_replace(u.url, '^[A-Za-z]+://', '')
       |      ELSE u.url END AS url,
       |    CAST(concat('0x', substr(md5(CAST(u.doc_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) % 1000 < 150 AS mal
       |  FROM uu u),
       |cparts2 AS (
       |  SELECT doc_id, mal,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    regexp_replace(
       |      lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)),
       |      '^.*@', '') AS hostport,
       |    CASE regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
       |         WHEN '/a%2fb' THEN '/a%2Fb'
       |         WHEN '/x%41y' THEN '/xAy'
       |         ELSE regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)
       |         END AS rawpath,
       |    replace(regexp_extract(regexp_replace(url, '#.*$$', ''),
       |      '\\?([^#]*)', 1), '%31', '1') AS rawq
       |  FROM uu2),
       |canon2 AS (
       |  SELECT doc_id,
       |    CASE WHEN mal THEN NULL ELSE
       |    scheme || '://' ||
       |    replace(regexp_extract(hostport, '^([^:]*)', 1),
       |      'bücher.', 'xn--bcher-kva.') ||
       |    CASE WHEN regexp_extract(hostport, ':([0-9]+)$$', 1) = ''
       |           THEN ''
       |         WHEN CAST(regexp_extract(hostport, ':([0-9]+)$$', 1) AS INT)
       |           = CASE scheme WHEN 'http' THEN 80 WHEN 'https' THEN 443
       |             ELSE -1 END THEN ''
       |         ELSE ':' || CAST(CAST(regexp_extract(hostport,
       |           ':([0-9]+)$$', 1) AS INT) AS VARCHAR) END ||
       |    CASE WHEN rawpath = '' THEN '/' ELSE rawpath END ||
       |    CASE WHEN rawq = '' THEN ''
       |         ELSE '?' || array_to_string(list_sort(
       |           string_split(rawq, '&')), '&') END
       |    END AS c
       |  FROM cparts2)
       |SELECT count(*) AS total_rows, count(c) AS parseable,
       |  count(*) - count(c) AS dead_letter,
       |  count(DISTINCT c) AS n_canonical,
       |  count(c) - count(DISTINCT c) AS dup_rows
       |FROM canon2""".stripMargin

  // --------------------------------------------------------------- q138
  // Domain-level quality rollup (RefinedWeb blocklist induction): per
  // registrable domain, URL dup rate × gopher keep rate × mean words →
  // ranked block_score. Pure composition of shipped operators
  // (gopherQualityFilter at q125's tuned bounds + domainQualityRollup),
  // map-only into ONE domain-keyed aggregate — no join: the synthetic
  // URL derives from doc_id, so it rides the gopher projection.
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val g = graft.operators.Curation.gopherQualityFilter(
        Tables.documents(s, dir), "doc_id", "text",
        minWords = 20, maxWords = 90,
        minMeanWordLen = 3.9, maxMeanWordLen = 5.1,
        minUniqueFrac = 0.35, minStopwordFrac = 0.02,
        stopwords = Seq("the", "a"))
      .withColumn("url", synthUrl)
    WebCuration.domainQualityRollup(g, "url", "doc_id", "keep", "n_words")
      .orderBy(col("block_score").desc, col("domain"))
  }

  private val q138Sql =
    s"""$synthUrlSql,
       |$canonSql,
       |dom AS (
       |  SELECT doc_id, canonical_url, $domainCaseSql AS domain
       |  FROM canon),
       |t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_words,
       |    CAST(list_sum(list_transform(toks,
       |      x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
       |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS mwl,
       |    CAST(len(list_distinct(toks)) AS DOUBLE)
       |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS uf,
       |    CAST(len(list_filter(toks, w -> list_contains(['the','a'], w)))
       |      AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS sf
       |  FROM t),
       |k AS (
       |  SELECT doc_id, n_words,
       |    ((n_words >= 20 AND n_words <= 90)
       |      AND (mwl >= 3.9 AND mwl <= 5.1)
       |      AND uf >= 0.35 AND sf >= 0.02) AS keep
       |  FROM m),
       |agg AS (
       |  SELECT d.domain,
       |    count(*) AS n_docs,
       |    count(d.canonical_url) AS parseable,
       |    count(DISTINCT d.canonical_url) AS n_canonical,
       |    round(avg(CAST(k.keep AS INT)), 6) AS keep_rate,
       |    round(avg(CAST(k.n_words AS BIGINT)), 6) AS avg_words,
       |    round(CAST(count(d.canonical_url)
       |        - count(DISTINCT d.canonical_url) AS DOUBLE)
       |      / CAST(greatest(count(d.canonical_url), 1) AS DOUBLE), 6)
       |      AS dup_rate
       |  FROM dom d JOIN k USING (doc_id)
       |  WHERE d.domain IS NOT NULL
       |  GROUP BY d.domain)
       |SELECT domain, n_docs, parseable, n_canonical, keep_rate,
       |  avg_words, dup_rate,
       |  round((dup_rate + (1 - keep_rate)) / 2, 6) AS block_score
       |FROM agg
       |ORDER BY block_score DESC, domain""".stripMargin

  // --------------------------------------------------------------- q143
  // HTML main-content extraction (trafilatura/jusText-style): documents
  // render to synthetic HTML closed-form (the q106 bit-model trick —
  // the generator, not the parser, is what the oracle replays): 8-token
  // lines become role-cycled elements (nav container / pure-link
  // paragraph / partial-link paragraph / entity-bearing paragraph /
  // plain paragraph) wrapped in head/title/script/comment/footer noise.
  // The extractor must strip script+comment+containers wholesale, pull
  // the title, segment blocks, decode &amp;, and drop blocks whose
  // link density exceeds 0.5 — inverting the construction exactly, so
  // every output field is closed-form over the same token slices in
  // DuckDB.
  /** q143/q146 shared closed-form HTML page synthesis from the doc's
    * token array (see q143's comment for the role model). */
  private[queries] def synthHtml(toks: Column): Column = {
    val nLines = ceil(size(toks).cast("double") / 8d).cast("int")
    val body = array_join(transform(sequence(lit(0), nLines - 1), i => {
      val line = array_join(slice(toks, i * 8 + 1, lit(8)), " ")
      val tok1 = array_join(slice(toks, i * 8 + 1, lit(1)), "")
      val rest = array_join(slice(toks, i * 8 + 2, lit(7)), " ")
      when(i % 5 === 0,
          concat(lit("<nav><a href=\"#\">"), line, lit("</a></nav>")))
        .when(i % 5 === 1,
          concat(lit("<p><a href=\"#\">"), line, lit("</a></p>")))
        .when(i % 5 === 2,
          concat(lit("<p><a href=\"#\">"), tok1, lit("</a> "), rest,
            lit("</p>")))
        .when(i % 5 === 3,
          concat(lit("<p>"), line, lit(" x&amp;y</p>")))
        .otherwise(concat(lit("<p>"), line, lit("</p>")))
    }), "")
    concat(
      lit("<html><head><title>"),
      array_join(slice(toks, 1, 3), " "),
      lit("</title><script>var q = \"<p>not text</p>\";</script>" +
        "</head><body>"),
      body,
      lit("<!-- tail --><footer>site footer boilerplate</footer>" +
        "</body></html>"))
  }

  private def q143(s: SparkSession, dir: String): DataFrame = {
    // r16: materialized token array — synthHtml slices its tokens ~3x
    // per 8-token line inside a lambda, so an inline tokens(text) would
    // re-split the doc per line (q160 trap)
    val pages = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), synthHtml(col("_toks")).as("html"))
    WebCuration.extractMainContent(pages, "doc_id", "html")
      .select(col("doc_id"), col("title"),
        col("n_blocks").cast("long").as("n_blocks"),
        col("n_dropped").cast("long").as("n_dropped"),
        md5(col("text")).as("text_hash"),
        col("link_chars"), col("text_chars"))
      .orderBy(col("doc_id"))
  }

  private val q143Sql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |  WHERE length(trim(text)) > 0),
       |ln AS (
       |  SELECT doc_id, x.i,
       |    array_to_string(list_slice(toks, x.i*8 + 1, x.i*8 + 8), ' ')
       |      AS line,
       |    list_extract(toks, x.i*8 + 1) AS tok1
       |  FROM t, unnest(range(0, CAST(ceil(len(toks) / 8.0) AS INT)))
       |    AS x(i)),
       |b AS (
       |  SELECT doc_id, i, i % 5 AS role, line,
       |    CASE WHEN i % 5 = 3 THEN line || ' x&y' ELSE line END AS btext,
       |    CASE WHEN i % 5 = 1 THEN length(line)
       |         WHEN i % 5 = 2 THEN length(tok1) ELSE 0 END AS a_chars
       |  FROM ln WHERE i % 5 <> 0),
       |k AS (
       |  SELECT *, (CAST(a_chars AS DOUBLE) > 0.5 * length(btext))
       |    AS dropped
       |  FROM b),
       |g AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dropped,
       |    md5(coalesce(string_agg(btext, chr(10) ORDER BY i)
       |      FILTER (WHERE NOT dropped), '')) AS text_hash,
       |    CAST(sum(a_chars) AS BIGINT) AS link_chars,
       |    CAST(sum(length(btext)) AS BIGINT) AS text_chars
       |  FROM k GROUP BY doc_id),
       |ti AS (
       |  SELECT doc_id, array_to_string(list_slice(toks, 1, 3), ' ')
       |    AS title
       |  FROM t)
       |SELECT ti.doc_id, ti.title,
       |  coalesce(g.n_blocks, 0) AS n_blocks,
       |  coalesce(g.n_dropped, 0) AS n_dropped,
       |  coalesce(g.text_hash, md5('')) AS text_hash,
       |  coalesce(g.link_chars, 0) AS link_chars,
       |  coalesce(g.text_chars, 0) AS text_chars
       |FROM ti LEFT JOIN g USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q146
  // END-TO-END web curation pipeline — the C4/RefinedWeb funnel as one
  // composed query over shipped operators, nothing bespoke: synthetic
  // HTML (q143's closed-form generator) → extractMainContent (strip
  // containers/script/link-heavy blocks) → lineDedupText (cross-doc
  // boilerplate lines drop wholesale, minDocs=3) → gopherQualityFilter
  // on the CLEANED text (q125 bounds) → registrable domain. One row per
  // page: funnel counters + keep verdict + the cleaned-text digest.
  // The oracle replays the whole chain closed-form from the same token
  // slices (kept blocks → boilerplate set → rebuilt text → gopher
  // ratios → PSL domain) — a hash match gates the COMPOSITION: every
  // stage's output is the next stage's input, so any drift anywhere in
  // the funnel breaks the final digest.
  private def q146(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    // r16: materialized token array before synthHtml (q143 note)
    val pages = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), synthHtml(col("_toks")).as("html"))
    val extracted = WebCuration.extractMainContent(pages, "doc_id", "html")
      .select(col("doc_id"), col("text"))
    val cleaned = Curation.lineDedupText(extracted, "doc_id", "text",
      minDocs = 3)
    val quality = Curation.gopherQualityFilter(
      cleaned.select(col("doc_id"), col("text")), "doc_id", "text",
      minWords = 20, maxWords = 90,
      minMeanWordLen = 3.9, maxMeanWordLen = 5.1,
      minUniqueFrac = 0.35, minStopwordFrac = 0.02,
      stopwords = Seq("the", "a"))
    val domains = Tables.documents(s, dir)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"),
        WebCuration.registrableDomain(
          WebCuration.urlHost(synthUrl)).as("domain"))
    cleaned
      .join(quality.select(col("doc_id"), col("n_words"), col("keep")),
        "doc_id")
      .join(domains, "doc_id")
      .select(col("doc_id"), col("domain"), col("n_lines"),
        col("n_removed"), col("n_words").cast("long").as("n_words"),
        col("keep"), md5(col("text")).as("text_hash"))
      .orderBy(col("doc_id"))
  }

  private val q146Sql =
    s"""$synthUrlSql,
       |$canonSql,
       |dmn AS (
       |  SELECT doc_id, $domainCaseSql AS domain FROM canon),
       |t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |  WHERE length(trim(text)) > 0),
       |ln AS (
       |  SELECT doc_id, x.i,
       |    array_to_string(list_slice(toks, x.i*8 + 1, x.i*8 + 8), ' ')
       |      AS line,
       |    list_extract(toks, x.i*8 + 1) AS tok1
       |  FROM t, unnest(range(0, CAST(ceil(len(toks) / 8.0) AS INT)))
       |    AS x(i)),
       |b AS (
       |  SELECT doc_id, i, i % 5 AS role, line,
       |    CASE WHEN i % 5 = 3 THEN line || ' x&y' ELSE line END AS btext,
       |    CASE WHEN i % 5 = 1 THEN length(line)
       |         WHEN i % 5 = 2 THEN length(tok1) ELSE 0 END AS a_chars
       |  FROM ln WHERE i % 5 <> 0),
       |kept AS (
       |  SELECT doc_id, i, btext FROM b
       |  WHERE NOT (CAST(a_chars AS DOUBLE) > 0.5 * length(btext))),
       |boiler AS (
       |  SELECT btext FROM kept WHERE length(btext) > 0
       |  GROUP BY btext HAVING count(DISTINCT doc_id) >= 3),
       |cl AS (
       |  SELECT k.doc_id, k.i, k.btext,
       |    (bo.btext IS NOT NULL) AS bl
       |  FROM kept k LEFT JOIN boiler bo USING (btext)),
       |dl AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(sum(CASE WHEN bl THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_removed,
       |    coalesce(string_agg(btext, chr(10) ORDER BY i)
       |      FILTER (WHERE NOT bl), '') AS ctext
       |  FROM cl GROUP BY doc_id),
       |-- a page with ZERO kept blocks extracts to '' — one empty line
       |fl AS (
       |  SELECT t.doc_id,
       |    coalesce(dl.n_lines, 1) AS n_lines,
       |    coalesce(dl.n_removed, 0) AS n_removed,
       |    coalesce(dl.ctext, '') AS ctext
       |  FROM t LEFT JOIN dl USING (doc_id)),
       |gm AS (
       |  SELECT doc_id, n_lines, n_removed, ctext,
       |    string_split_regex(trim(ctext), '\\s+') AS gt
       |  FROM fl),
       |gq AS (
       |  SELECT doc_id, n_lines, n_removed, ctext,
       |    CAST(len(gt) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(gt,
       |      x -> CAST(length(x) AS BIGINT))) AS DOUBLE)
       |      / CAST(greatest(len(gt), 1) AS DOUBLE) AS mwl,
       |    CAST(len(list_distinct(gt)) AS DOUBLE)
       |      / CAST(greatest(len(gt), 1) AS DOUBLE) AS uf,
       |    CAST(len(list_filter(gt, w -> list_contains(['the','a'], w)))
       |      AS DOUBLE) / CAST(greatest(len(gt), 1) AS DOUBLE) AS sf
       |  FROM gm)
       |SELECT g.doc_id, dmn.domain, g.n_lines, g.n_removed, g.n_words,
       |  ((g.n_words >= 20 AND g.n_words <= 90)
       |    AND (g.mwl >= 3.9 AND g.mwl <= 5.1)
       |    AND g.uf >= 0.35 AND g.sf >= 0.02) AS keep,
       |  md5(g.ctext) AS text_hash
       |FROM gq g JOIN dmn USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q146_web_pipeline" -> (q146 _),
    "q143_html_extract" -> (q143 _),
    "q133_url_dedup" -> (q133 _),
    "q134_domain_rollup" -> (q134 _),
    "q135_domain_quota" -> (q135 _),
    "q137_url_funnel" -> (q137 _),
    "q138_domain_blocklist" -> (q138 _))

  val oracleSql: Map[String, String] = Map(
    "q146_web_pipeline" -> q146Sql,
    "q143_html_extract" -> q143Sql,
    "q133_url_dedup" -> q133Sql,
    "q134_domain_rollup" -> q134Sql,
    "q135_domain_quota" -> q135Sql,
    "q137_url_funnel" -> q137Sql,
    "q138_domain_blocklist" -> q138Sql)
}
