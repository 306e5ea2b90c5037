package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Stage-level breakdown of the q25 similarity join at sf0.1. */
object Q25Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q25prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1000)
    docs.count()
    (1 to 2).foreach { round =>
      spark.catalog.clearCache()
      println(s"--- round $round")
      val s = time("shingleSets build+cache") {
        val s0 = Dedup.shingleSets(docs, "doc_id", "text", 3)
          .filter(size(col("shingles")) > 0)
          .withColumn("sz", size(col("shingles")))
          .cache()
        s0.count()
        s0
      }
      val prefLen = (col("sz") - ceil(col("sz") * 0.4) + 1).cast("int")
      val pref = s.select(col("id"), col("sz"),
        posexplode(slice(col("shingles"), lit(1), prefLen)))
        .withColumnRenamed("col", "tok")
      time("prefix explode count")(pref.count())
      val overlapBound = (col("a.sz") + col("b.sz")) * (0.4 / 1.4)
      val posCap = lit(1) + least(
        col("a.sz") - col("a.pos") - 1, col("b.sz") - col("b.pos") - 1)
      val cand = pref.as("a").join(pref.as("b"),
          col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
            col("a.sz") >= col("b.sz") * 0.4 &&
            col("b.sz") >= col("a.sz") * 0.4 &&
            posCap >= overlapBound)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      time("candidates")(println("  cand=" + cand.count()))
      val sets = s.select(col("id"), col("shingles"), col("sz"))
      val out = cand
        .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a"),
          col("sz").as("sz_a")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b"),
          col("sz").as("sz_b")), "id_b")
        .withColumn("inter",
          graft.plans.SetExpressions.sortedIntersectCount(
            col("sh_a"), col("sh_b")).cast("double"))
        .withColumn("jaccard",
          col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
        .filter(col("jaccard") >= 0.4)
      time("verify+full")(out.count())
    }
    spark.stop()
  }
}
