package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Stage bisection for q104's ×100 superlinearity: times (a) the corpus
  * cell-assignment pass, (b) the candidate join without the top-k window,
  * (c) the full adaptive query — to localize where the 50 s goes.
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.Q104Prof
  */
object Q104Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val cents = graft.queries.VectorQueries.centroidsForProfiling
    val emb = Tables.embeddings(spark, sfDir)
    time("warm corpus count")(emb.count())
    val stats = time("ivfCellStats collect") {
      Similarity.ivfCellStats(emb, cents)
        .select(col("cell"), col("n_vecs"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val budget = math.max(stats.values.sum / 8L, 1L)
    System.err.println(s"[prof] budget=$budget cells=${stats.size}")
    val q = emb.filter(col("vec_id") < 100)
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
    val plan = Similarity.ivfKnnAdaptive(q, emb, 10, cents, stats, budget)
    plan.explain("formatted")
    time("full adaptive (run 1)") { plan.count() }
    time("full adaptive (run 2)") {
      Similarity.ivfKnnAdaptive(q, emb, 10, cents, stats, budget).count()
    }
    spark.stop()
  }
}
