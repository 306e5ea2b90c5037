package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.WebCuration

/** Micro-profile of the URL/domain family's hot expressions: the native
  * registrable-domain kernel vs its Column-composition twin, and URL
  * canonicalization, at 1M rows (local[8], 3 timed runs each after the
  * codegen warm first run).
  *
  * Measured 2026-08-15 (this box): kernel 0.23 s/1M (~1.8 µs/row incl.
  * scan; ~0.2 µs in the kernel itself), Column twin 14.1 s/1M
  * (~113 µs/row — candidate subtrees duplicated across ~18 probe
  * sites, no CSE), canonicalizeUrl ~1.1 s/1M, and the kernel at a
  * FULL-PSL-sized 9k-rule set 0.14 s/1M — flat in |rules|, confirming
  * the O(1) hash-probe claim (the twin's literal-map GetMapValue scans
  * are O(rules) per probe and its plan would not even compile at 9k).
  * The ~60× kernel win is why q134 dropped 2.8 s → ~0.4 s at sf0.1 —
  * its domain column is a filter+groupBy key, so predicate pushdown
  * re-inlines the expression below the projection and the
  * per-evaluation cost multiplies (the q105 lesson).
  *
  * r13 (userinfo strip + PctNormalize in the canonical path): the
  * adversarial userinfo+pct URL shape canonicalizes at ~0.9 s/1M —
  * the SAME band as the r12 plain shape (the two added regex passes
  * and the pct kernel are noise next to the existing regexp_extract
  * battery); the pct kernel alone on '%'-free strings is ~0.13 s/1M
  * (~0.1 µs/row — the fast path returns the input UTF8String without
  * allocating).
  */
object WebProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      f // unbilled warm run: codegen/JIT compile, as the header claims
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    val hosts = spark.range(1000000).select(
      concat(lit("h"), (col("id") % 100).cast("string"),
        lit(".example.com")).as("host"))
    time("domain-kernel-1M") {
      hosts.select(WebCuration.registrableDomain(col("host")).as("d"))
        .filter(col("d").isNotNull).count()
    }
    time("domain-twin-1M") {
      hosts.select(WebCuration.registrableDomainColumnForm(col("host"))
          .as("d"))
        .filter(col("d").isNotNull).count()
    }
    val urls = spark.range(1000000).select(
      concat(lit("HTTP://H"), (col("id") % 100).cast("string"),
        lit(".Example.COM:80/a/b?b=2&a=1#f")).as("url"))
    time("canonicalize-1M") {
      urls.select(WebCuration.canonicalizeUrl(col("url")).as("c"))
        .filter(col("c").isNotNull).count()
    }
    // r13: userinfo + pct-encoded variants through the full canonical
    // path (regex strip + PctNormalize kernel) — the adversarial shape
    val pctUrls = spark.range(1000000).select(
      concat(lit("http://u:p@h"), (col("id") % 100).cast("string"),
        lit(".example.com/a%2fb/x%41y?b=2&a=%31#f")).as("url"))
    time("canonicalize-pct-1M") {
      pctUrls.select(WebCuration.canonicalizeUrl(col("url")).as("c"))
        .filter(col("c").isNotNull).count()
    }
    // the pct kernel alone (fast path: no '%' → zero-copy return)
    val paths = spark.range(1000000).select(
      concat(lit("/plain/path/"), (col("id") % 100).cast("string"))
        .as("p"))
    time("pct-kernel-fastpath-1M") {
      paths.select(graft.plans.WebExpressions.pctNormalize(col("p"))
        .as("n")).filter(length(col("n")) > 0).count()
    }
    // full-PSL-size rule set (the real publicsuffix.org list is ~9k
    // rules): per-probe cost must stay O(1) — hash sets, not the
    // literal-map linear scans of the Column twin
    val bigPsl = WebCuration.defaultPsl ++
      (0 until 9000).map(i =>
        graft.operators.WebCuration.PslRule(s"tld$i", isWildcard = false,
          isException = false))
    time("domain-kernel-9k-rules-1M") {
      hosts.select(WebCuration.registrableDomain(col("host"), bigPsl)
          .as("d"))
        .filter(col("d").isNotNull).count()
    }
    spark.stop()
  }
}
