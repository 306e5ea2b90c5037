package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the RUNTIME-FINAL physical plan of a SparkEntry query under a
  * runtime SQLConf A/B — the evidence surface for confs whose effect is
  * invisible in the static `explain()` output (AQE re-planning decisions,
  * e.g. `canChangeCachedPlanOutputPartitioning`: the plan divergence only
  * exists after the adaptive plan finalizes at execution).
  *
  * Usage: runMain graft.tools.CachedPlanDump <confKey> <val> <query>
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object CachedPlanDump {
  def main(args: Array[String]): Unit = {
    val Array(confKey, value, qname) = args.take(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(confKey, value)
    val df = graft.SparkEntry.queries(qname)(spark, sfDir)
    df.count() // finalize every adaptive plan
    println(s"=== $qname under $confKey=$value (runtime-final plan) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
