package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the optimized plan of shingleSets — checks whether the token
  * split survives as its own projection or is re-inlined per element.
  */
object ExplainShingles {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id") < 1000)
    val s = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3)
    println("=== optimized ===")
    println(s.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
