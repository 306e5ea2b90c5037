package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scratch perf probe for q28's phases (not part of the driver contract). */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("CCPROF_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 1000L)
    docs.count()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    (1 to 3).foreach { round =>
      println(s"--- pass $round")
      val pairs = time("pairs (jaccardSimilarityJoin, materialized)") {
        val p = Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.4)
          .cache()
        p.count()
        p
      }
      time("connectedComponents") {
        Dedup.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs).count()
      }
      time("dedupCorpus full (uncached pairs)") {
        Dedup.dedupCorpus(docs, "doc_id",
          Dedup.jaccardSimilarityJoin(docs, "doc_id", "text", 3, 0.4))
          .count()
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
