package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 q160 A/B: fused one-pass HLL+exact (deterministicHllWithExact)
  * vs the r15 two-branch form (countDistinct ⋈ deterministicHll), as
  * interleaved same-JVM draws — the only comparison the bench-noise
  * discipline accepts for sub-second moves.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.HllProf [reps]
  */
object HllProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def grams(s: SparkSession): DataFrame =
      graft.Tables.documents(s, sfDir)
        .select(col("source"),
          graft.functions.TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("source"),
          explode(array_distinct(graft.functions.TextAnalysis
            .shinglesOfTokens(col("_toks"), 4))).as("gram"))

    def fused(s: SparkSession): DataFrame =
      graft.operators.Sketches.deterministicHllWithExact(
        grams(s), Seq("source"), "gram", p = 8)

    def twoBranch(s: SparkSession): DataFrame = {
      val t = grams(s)
      val hll = graft.operators.Sketches.deterministicHll(
        t, Seq("source"), "gram", p = 8)
      t.groupBy("source").agg(countDistinct(col("gram")).as("n_exact"))
        .join(hll, Seq("source"))
    }

    val arms: Seq[(String, SparkSession => DataFrame)] =
      Seq("fused" -> (fused _), "two_branch" -> (twoBranch _))
    // warm both plans (codegen, file listing)
    arms.foreach { case (_, f) => f(spark).count() }
    val draws = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { r =>
      arms.foreach { case (n, f) =>
        spark.sparkContext.setJobDescription(s"hllprof $n rep $r")
        val t0 = System.nanoTime()
        f(spark).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        draws(n) = draws(n) :+ dt
        println(f"""{"probe":"hllprof","arm":"$n","rep":$r,"sec":$dt%.3f}""")
      }
    }
    arms.foreach { case (n, _) =>
      println(f"""{"probe":"hllprof_min","arm":"$n","min_sec":${draws(n).min}%.3f,"draws":${draws(n).map(d => f"$d%.3f").mkString("[", ",", "]")}}""")
    }
    spark.stop()
  }
}
