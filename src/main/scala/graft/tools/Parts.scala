package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Parts {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    println("docs rows=" + docs.count())
    println("docs scan partitions=" + docs.rdd.getNumPartitions)
    val f = docs.filter(col("doc_id") < 1000)
    println("filtered partitions=" + f.rdd.getNumPartitions)
    println("avg text len=" + docs.select(avg(length(col("text")))).head().getDouble(0))
    println("avg tokens=" + docs.select(avg(size(split(trim(col("text")), "\\s+")))).head().getDouble(0))
    spark.stop()
  }
}
