package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** s131 candidate-DISTINCT scale study (r13): times the containmentJoin
  * candidate subtree's three contending DISTINCT strategies INTERLEAVED
  * in one JVM, so co-tenant noise hits every arm equally in expectation
  * (the per-process A/B this replaced drew 3.9 s and 16.3 s for the
  * SAME arm back to back):
  *
  *   a) fixed-count distinct        — the r12 shipping form: partial
  *      agg → Exchange(spark.sql.shuffle.partitions) → final agg;
  *   b) AQE-fanned distinct         — same plan, but the exchange
  *      starts at initialPartitionNum=1024 and AQE coalesces to the
  *      advisory size (runtime SQL conf, flipped per measurement);
  *   c) volume-sized repartition    — explicit
  *      repartition(parts, id_a, id_b) below the distinct, parts from
  *      the measured shingle-token mass (the candidate-volume proxy a
  *      library operator can compute without session-conf control).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.DistinctProf
  *        [reps] [tokensPerPart]
  */
object DistinctProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x10")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val tokensPerPart = args.drop(1).headOption.map(_.toLong)
      .getOrElse(4000000L)
    val threshold = 0.65
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val sh = graft.operators.Dedup
      .hashedShingleSets(docs, "doc_id", "text", 3)
      .filter(size(col("shingles")) > 0)
      .withColumn("sz", size(col("shingles")))
    val toks = sh.select(col("id"), col("sz"),
      explode(col("shingles")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("tok"))
    val pref = toks.join(freq.hint("merge"), "tok")
      .withColumn("pos", row_number().over(w) - 1)
      .filter(col("pos") <
        (col("sz") - ceil(col("sz") * threshold) + 1).cast("int"))
    def cand = pref.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("tok")).hint("merge").as("a")
      .join(toks.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("tok")).hint("merge").as("b"),
        col("a.tok") === col("b.tok") && col("a.id_a") =!= col("b.id_b") &&
          col("b.sz_b").cast("double") / col("a.sz_a").cast("double") >=
            threshold)
      .select(col("a.id_a"), col("b.id_b"))

    val tokMass = sh.agg(sum(col("sz"))).head().getLong(0)
    val sized = math.min(4096L,
      math.max(cpus.toLong, tokMass / tokensPerPart)).toInt
    System.err.println(s"[dprof] tokMass=$tokMass sizedParts=$sized")

    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    def time(label: String)(f: => Long): Unit = {
      System.gc(); Thread.sleep(500)
      val t0 = System.nanoTime()
      val n = f
      System.err.println(
        f"[dprof] $label%-22s ${(System.nanoTime - t0) / 1e9}%8.2fs  rows=$n" +
          f"  load=${scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0)}")
    }
    (1 to reps).foreach { r =>
      time(s"a_fixed32 r$r") {
        spark.conf.set(initKey, cpus); cand.distinct().count()
      }
      time(s"b_aqe1024 r$r") {
        spark.conf.set(initKey, "1024"); cand.distinct().count()
      }
      time(s"c_sized$sized r$r") {
        spark.conf.set(initKey, cpus)
        cand.repartition(sized, col("id_a"), col("id_b")).distinct().count()
      }
    }
    spark.stop()
  }
}
