package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ShingleProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sp] $l: ${(System.nanoTime()-t0)/1e9}%.2fs"); r }
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") < 1000)
    docs.count()
    (1 to 2).foreach { r =>
      println(s"--- round $r")
      time("shingleSets 1part")(
        Dedup.shingleSets(docs, "doc_id", "text", 3).count())
      time("shingleSets repart32")(
        Dedup.shingleSets(docs.repartition(32), "doc_id", "text", 3).count())
      time("tokens only")(
        docs.select(split(trim(col("text")), "\\s+").as("t")).count())
      time("tokens+transform concat")(
        docs.select(graft.functions.TextAnalysis.tokens(col("text")).as("t"))
          .select(transform(sequence(lit(0), size(col("t"))-3),
            i => concat_ws(" ", element_at(col("t"), i+1),
              element_at(col("t"), i+2), element_at(col("t"), i+3))).as("sh"))
          .count())
      time("+distinct+sort")(
        docs.select(graft.functions.TextAnalysis.tokens(col("text")).as("t"))
          .select(array_sort(array_distinct(transform(sequence(lit(0), size(col("t"))-3),
            i => concat_ws(" ", element_at(col("t"), i+1),
              element_at(col("t"), i+2), element_at(col("t"), i+3))))).as("sh"))
          .count())
    }
    spark.stop()
  }
}
