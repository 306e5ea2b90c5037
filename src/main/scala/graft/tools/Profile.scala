package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query profiler: run one named SparkEntry query N times on a
  * given SF dir and print per-run wall seconds (first = cold, rest = warm)
  * — separates fixed scheduling/codegen overhead from data-proportional
  * work when tuning the bench tail.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // AQE may re-plan cached-frame materialization (see graft.Bench)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      try {
        (if (t == "events") graft.Tables.events(spark, sfDir)
         else graft.Tables.load(spark, sfDir, t)).count()
      } catch { case _: Throwable => () }
    }
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      spark.catalog.clearCache() // bench-honest: no cross-run cache reuse
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
    }
    spark.stop()
  }
}
