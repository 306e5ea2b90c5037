package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity
import graft.plans.AggExpressions

/** Stage bisection for q105's ×1000 residual (p = 1.20): times (a) the
  * corpus encode pass alone (cell + PQ codes), (b) the candidate join +
  * ADC scoring WITHOUT the top-k, (c) the full window-ranked query, and
  * (d) a TopKByScore-aggregate variant — to localize whether the
  * superlinear term is the encode kernel, the join, or the rank.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.Q105Prof
  */
object Q105Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x1000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = sc.stageInfo
          val ms = for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b
          if (ms.exists(_ > 500))
            System.err.println(f"[stage] ${i.stageId}%4d ${ms.get / 1000.0}%7.1fs tasks=${i.numTasks}%4d ${i.name.take(80)}")
        }
      })
    val cents = graft.queries.VectorQueries.centroidsForProfiling
    val cbs = graft.queries.VectorQueries.codebooksForProfiling
    val emb = Tables.embeddings(spark, sfDir)
    time("warm corpus count")(emb.count())
    val q = emb.filter(col("vec_id") < 100)
    val parts = Similarity.ivfPqParts(q, emb, cents, cbs)
    time("(a) corpus encode only")(parts._1.count())
    time("(b) join+adc, no rank")(parts._2.count())
    val full = Similarity.ivfPqKnn(q, emb, 10, cents, cbs)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
      parts._2.explain("formatted")
      return
    }
    time("(c) full window form (run 1)")(full.count())
    time("(c) full window form (run 2)") {
      Similarity.ivfPqKnn(q, emb, 10, cents, cbs).count()
    }
    // (d) aggregate top-k over the same scored candidates
    def aggForm = {
      val scored = Similarity.ivfPqParts(q, emb, cents, cbs)._2
      scored.groupBy(col("query_id"))
        .agg(AggExpressions.topKByScore(-col("adist"), col("neighbor_id"), 10)
          .as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), (col("pos") + 1).as("rank"),
          col("col.id").as("neighbor_id"), (-col("col.score")).as("adist"))
    }
    time("(d) topK-agg form (run 1)")(aggForm.count())
    time("(d) topK-agg form (run 2)")(aggForm.count())
    spark.stop()
  }
}
