package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object CacheProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cp] $l: ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") < 1000)
    docs.count()
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
      .withColumn("sz", size(col("shingles")))
    val hashed = sets.select(col("id"),
      array_sort(array_distinct(transform(col("shingles"), s => xxhash64(s))))
        .as("shingles")).withColumn("sz", size(col("shingles")))
    (1 to 2).foreach { r =>
      println(s"--- round $r")
      time("count no cache")(sets.count())
      val c1 = sets.cache(); time("cache strings")(c1.count()); c1.unpersist()
      val c2 = hashed.cache(); time("cache hashed longs")(c2.count()); c2.unpersist()
      val c3 = sets.repartition(32).cache()
      time("cache strings repart32")(c3.count()); c3.unpersist()
    }
    spark.stop()
  }
}
