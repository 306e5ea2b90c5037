package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions

/** Stage bisection for the brute-force KNN baseline: (a) the BNLJ pair
  * stream + dot only, (b) + rounded hoisted-norm sim, (c) the full query
  * with the topK aggregate — to localize the per-pair cost.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.Q30Prof
  */
object Q30Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = Tables.embeddings(spark, sfDir)
    time("warm")(emb.count())
    val q = broadcast(emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("qv"),
        VectorFunctions.norm(col("embedding")).as("_qn")))
    val c = graft.operators.Partitioning.widen(emb)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        VectorFunctions.norm(col("embedding")).as("_cn"))
    val pairs = q.join(c, col("query_id") =!= col("neighbor_id"))
    time("(a) pairs + dot sum") {
      pairs.select(VectorFunctions.dot(col("qv"), col("cv")).as("d"))
        .agg(sum(col("d"))).head()
    }
    time("(b) + rounded sim agg") {
      pairs.select((round(VectorFunctions.dot(col("qv"), col("cv")) /
          (col("_qn") * col("_cn")), 6)).as("sim"))
        .agg(sum(col("sim"))).head()
    }
    time("(c) full bruteForceKnn") {
      graft.operators.Similarity.bruteForceKnn(
        emb.filter(col("vec_id") < 100), emb, 10).count()
    }
    time("(c2) full again") {
      graft.operators.Similarity.bruteForceKnn(
        emb.filter(col("vec_id") < 100), emb, 10).count()
    }
    spark.stop()
  }
}
