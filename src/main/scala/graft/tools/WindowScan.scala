package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

import graft.SparkEntry

/** One-off diagnostic: list queries whose PHYSICAL plan contains a
  * WindowExec with an empty partitionSpec (single-partition window — the
  * "Moving all data to a single partition" warning). Run:
  * sbt "runMain graft.tools.WindowScan [sfDir]".
  */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
        var hits = 0
        def walk(p: SparkPlan): Unit = {
          p.foreach {
            case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
            case w: WindowExec if w.partitionSpec.isEmpty => hits += 1
            case other => other.subqueries.foreach(walk)
          }
        }
        walk(q(spark, sfDir).queryExecution.executedPlan)
        if (hits > 0) println(s"[winscan] $name: $hits unpartitioned WindowExec")
      } catch { case e: Throwable =>
        println(s"[winscan] $name: ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
