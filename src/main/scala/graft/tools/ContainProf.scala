package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** containmentJoin scale profiler: prints the formatted physical plan and
  * stage-level wall times for the prefix-filtered containment join over
  * the full documents table of SPARK_GRAFT_SF_DIR, at the soak's
  * threshold. Usage:
  *   SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/scale/x100 \
  *     sbt "runMain graft.tools.ContainProf [threshold]"
  */
object ContainProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val threshold = args.headOption.map(_.toDouble).getOrElse(0.65)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[cprof] $label ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    val out = Dedup.containmentJoin(docs, "doc_id", "text", n = 3,
      threshold = threshold)
    out.explain("formatted")
    val n = time(s"containmentJoin t=$threshold")(out.count())
    System.err.println(s"[cprof] rows=$n")
    spark.stop()
  }
}
