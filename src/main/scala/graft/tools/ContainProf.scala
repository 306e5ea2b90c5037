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
      // AQE initial-partition seam for scale studies (default = the
      // official fixed count; see graft.Bench for the s131 rationale)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      // shuffle files live until ContextCleaner GCs their dependency —
      // the Soak lesson applied to STAGE timing: at ×100 each prior
      // stage leaves tens of GB of shuffle scratch, and the r12 run
      // timed its last stage (candidate distinct) against a nearly
      // full disk, reading 97 s for a stage a gc-hygienic interleaved
      // rerun (tools/DistinctProf) measures at ~15 s. Sweep before
      // every stage so each is timed against a clean disk.
      System.gc(); Thread.sleep(2000)
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
    // stage decomposition for the exponent attribution (SCALE.md s131):
    // the same subtrees the operator builds, timed in isolation on a
    // fresh (uncached) plan each — shingle+freq, the prefix index (df
    // join + per-doc rank window), and the candidate join+distinct
    import graft.plans.SetExpressions
    val sh = graft.operators.Dedup
      .hashedShingleSets(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
      .withColumn("sz", size(col("shingles")))
    time("stage: shingle sets (count)")(sh.count())
    val toks = sh.select(col("id"), col("sz"),
      explode(col("shingles")).as("tok"))
    time("stage: explode+freq agg")(
      toks.groupBy("tok").agg(count(lit(1)).as("df")).count())
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val pref = toks.join(freq.hint("merge"), "tok")
      .withColumn("pos", row_number().over(w) - 1)
      .filter(col("pos") <
        (col("sz") - ceil(col("sz") * threshold) + 1).cast("int"))
    time("stage: prefix index (df join + rank window)")(pref.count())
    val cand = pref.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("tok")).hint("merge").as("a")
      .join(toks.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("tok")).hint("merge").as("b"),
        col("a.tok") === col("b.tok") && col("a.id_a") =!= col("b.id_b") &&
          col("b.sz_b").cast("double") / col("a.sz_a").cast("double") >=
            threshold)
      .select(col("a.id_a"), col("b.id_b"))
    time("stage: candidate join (pre-distinct rows)")(cand.count())
    time("stage: candidate distinct pairs")(cand.distinct().count())
    spark.stop()
  }
}
