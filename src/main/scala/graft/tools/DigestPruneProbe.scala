package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamingPipeline

/** Measures what the digest store's pfx bucketing buys per micro-batch:
  * builds a store from the full documents table (one seed batch, 16
  * pfx buckets), then times a SMALL batch's incrementalDedupBatch probe
  * and reports the store-scan volume (files/bytes via the scan metrics of
  * an equivalent probe plan) for the bucketed store vs a flat rewrite of
  * the same store. The pruning factor is touched-prefixes/16 — visible
  * only when the batch is small relative to the bucket count (trickle
  * ingestion, the latency-sensitive end of streaming dedup).
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DigestPruneProbe [batchRows]
  */
object DigestPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x10")
    val batchRows =
      args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[prune] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val work = java.nio.file.Files.createTempDirectory("graft-dprobe").toFile
    // ---- trickle mode: per-batch planning-cost trend over a long stream
    // with vs without the auto-compaction cadence. Without it the probe
    // union-reads O(batches) subdirs and per-batch wall grows; with the
    // cadence dir count stays bounded and the trend is flat.
    // Usage: runMain graft.tools.DigestPruneProbe trickle [nBatches]
    if (args.headOption.contains("trickle")) {
      val n = args.lift(1).map(_.toInt).getOrElse(50)
      def series(cadence: Int, label: String): (Seq[Double], Int) = {
        val dir = new java.io.File(work, label).getPath
        val times = (0 until n).map { b =>
          val rows = docs.filter(col("doc_id") % n === b).limit(4)
            .withColumn("text", concat(col("text"), lit(s" T$b")))
          val t0 = System.nanoTime()
          StreamingPipeline.incrementalDedupBatch(rows, b.toLong,
            "doc_id", "text", dir, compactMinDirs = cadence) {
            (res, _) => res.count(); ()
          }
          (System.nanoTime() - t0) / 1e9
        }
        val nDirs = Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty)
          .count(f => f.getName.startsWith("b") || f.getName.startsWith("c"))
        (times, nDirs)
      }
      def mean(xs: Seq[Double]) = xs.sum / xs.length
      val (tc, dc) = series(16, "cadence16")
      val (tn, dn) = series(Int.MaxValue, "nocompact")
      def head10(xs: Seq[Double]) = f"${mean(xs.slice(1, 11))}%.3f"
      def tail10(xs: Seq[Double]) = f"${mean(xs.takeRight(10))}%.3f"
      println(s"""{"mode":"trickle","batches":$n,""" +
        s""""cadence16":{"head10_sec":${head10(tc)},"tail10_sec":${tail10(tc)},"final_dirs":$dc},""" +
        s""""nocompact":{"head10_sec":${head10(tn)},"tail10_sec":${tail10(tn)},"final_dirs":$dn},""" +
        s""""sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val bucketed = new java.io.File(work, "bucketed").getPath
    // seed the bucketed store through the real writer (batch 0)
    time(s"seed bucketed store (${sfDir})") {
      // bucketMinStoreBytes=0: the seed batch must write the bucketed
      // layout regardless of (empty) prior-store size — the probe's
      // whole point is measuring that layout
      StreamingPipeline.incrementalDedupBatch(docs, 0L, "doc_id", "text",
        bucketed, bucketMinStoreBytes = 0L) { (_, _) => () }
    }
    // flat twin: same digests, no buckets
    val flat = new java.io.File(work, "flat").getPath
    time("rewrite flat store") {
      spark.read.parquet(s"$bucketed/b00000").select("content_hash")
        .write.mode("overwrite").parquet(s"$flat/b00000")
    }
    val batch = docs.orderBy(col("doc_id").desc).limit(batchRows)
      .withColumn("text", concat(col("text"), lit(" UNSEEN")))
      .persist()
    batch.count()
    // scan-volume metrics from the probe's own plan shape
    def probeScan(storeDir: String, prune: Boolean): (Long, Long) = {
      val store = spark.read.parquet(s"$storeDir/b00000")
      val touched = batch
        .select(substring(md5(col("text")), 1, 1).as("pfx"))
        .distinct().collect().map(_.getString(0)).toSeq
      val probed =
        if (prune)
          store.filter(col("pfx").isin(touched: _*))
            .join(broadcast(batch.select(md5(col("text"))
              .as("content_hash")).distinct()),
              Seq("content_hash"), "left_semi")
        else
          store.join(broadcast(batch.select(md5(col("text"))
            .as("content_hash")).distinct()),
            Seq("content_hash"), "left_semi")
      probed.collect()
      // unwrap AQE: the scan lives under AdaptiveSparkPlanExec's final plan
      def leaves(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          leaves(r.child)
        case other =>
          val kids = other.children ++ other.subqueries
          if (kids.isEmpty) Seq(other) else kids.flatMap(leaves)
      }
      val ls = leaves(probed.queryExecution.executedPlan)
      val scan = ls.find(_.metrics.contains("numFiles")).getOrElse {
        System.err.println("[prune] leaves: " + ls.map(l =>
          l.getClass.getSimpleName + l.metrics.keys.mkString("(", ",", ")"))
          .mkString(" | "))
        sys.error("no scan with numFiles metric")
      }
      (scan.metrics("numFiles").value,
        scan.metrics.get("filesSize").map(_.value).getOrElse(-1L))
    }
    val (bf, bb) = time("bucketed probe (pruned)")(probeScan(bucketed, prune = true))
    val (ff, fb) = time("flat probe (full scan)")(probeScan(flat, prune = false))
    // end-to-end per-batch wall through the real entry point
    def fullBatch(storeDir: String): Double = {
      val t0 = System.nanoTime()
      StreamingPipeline.incrementalDedupBatch(batch, 1L, "doc_id", "text",
        storeDir) { (res, _) => res.count(); () }
      (System.nanoTime() - t0) / 1e9
    }
    val tB = fullBatch(bucketed)
    val tF = fullBatch(flat)
    println(s"""{"batch_rows":$batchRows,"bucketed_files":$bf,"bucketed_bytes":$bb,"flat_files":$ff,"flat_bytes":$fb,"bucketed_batch_sec":$tB,"flat_batch_sec":$tF,"sf":"$sfDir"}""")
    spark.stop()
  }
}
