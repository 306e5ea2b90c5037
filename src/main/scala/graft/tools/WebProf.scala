package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.WebCuration

/** Micro-profile of the URL/domain family's hot expressions: the native
  * registrable-domain kernel vs its Column-composition twin, and URL
  * canonicalization, at 1M rows (local[8], 3 timed runs each after the
  * codegen warm first run).
  *
  * Measured 2026-08-15 (this box): kernel 0.35 s/1M (~2.8 µs/row incl.
  * scan), Column twin 14.5 s/1M (~116 µs/row — candidate subtrees
  * duplicated across ~18 probe sites, no CSE), canonicalizeUrl
  * ~1.1 s/1M. The 41× kernel win is why q134 dropped 2.8 s → ~0.2 s at
  * sf0.1 — its domain column is a filter+groupBy key, so predicate
  * pushdown re-inlines the expression below the projection and the
  * per-evaluation cost multiplies (the q105 lesson).
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
    spark.stop()
  }
}
