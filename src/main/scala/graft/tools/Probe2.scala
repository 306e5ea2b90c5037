package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch probe: minhash signature agreement for one document pair. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
      .filter(col("doc_id").isin(33, 436))
    val s = Dedup.hashedShingleSets(docs, "doc_id", "text", 3)
      .withColumn("sig",
        graft.plans.SetExpressions.minHashLongs(col("shingles"), 64))
      .select(col("id"), col("shingles"), col("sig"))
      .collect()
    val bySet = s.map(r => r.getLong(0) ->
      (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    val (shA, sigA) = bySet(33L)
    val (shB, sigB) = bySet(436L)
    println(s"[probe2] shingles A=${shA.size} B=${shB.size} " +
      s"inter=${shA.toSet.intersect(shB.toSet).size}")
    val agree = sigA.zip(sigB).count { case (a, b) => a == b }
    println(s"[probe2] signature positions agreeing: $agree / 64")
    val bandsHit = (0 until 32).count { b =>
      sigA.slice(b * 2, b * 2 + 2) == sigB.slice(b * 2, b * 2 + 2)
    }
    println(s"[probe2] bands(32x2) matching: $bandsHit")
    spark.stop()
  }
}
