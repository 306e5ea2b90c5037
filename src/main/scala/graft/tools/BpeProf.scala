package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** s140 merges-vs-cost study (r14): the BPE ENCODING path at realistic
  * merge counts — the r13 VERDICT's one flagged scale liability was
  * `applyBpeMerges`' per-merge expression fold (plan depth = |merges|,
  * dead at a 30k-rule vocabulary). The r14 kernel form
  * ([[graft.plans.BpeExpressions.bpeSegment]]) holds the whole ranked
  * table in ONE expression; this probe measures what actually scales
  * with |merges| now — the per-word encode cost — by timing the SAME
  * corpus encode under prefix slices of one learned table, INTERLEAVED
  * in a single JVM (bench-noise discipline: co-tenant spikes hit every
  * arm equally in expectation; report per-arm minima).
  *
  * Also times learnBpeMerges driver rounds at batch=1 vs batch=8 for a
  * fixed rule budget (the round-trip item: rounds cost model in
  * SCALE.md).
  *
  * Usage: runMain graft.tools.BpeProf [nDocs] [reps] [maxMerges]
  */
object BpeProf {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val maxMerges = args.drop(2).headOption.map(_.toInt).getOrElse(4000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // synthetic corpus: Zipf-ish draws from a 30k-word vocabulary of
    // 6-14 char words over 12 letters — enough distinct adjacent pairs
    // to learn maxMerges rules with real merge depth per word
    val vocabSize = 30000
    val docs = spark.range(nDocs.toLong).select(col("id").as("doc_id"),
      expr(s"""array_join(transform(sequence(1, 60), i ->
        concat('w', conv(cast(pow((abs(xxhash64(id * 60 + i)) % 10000)
          / 10000.0, 3.0) * $vocabSize as int), 10, 24))), ' ')""")
        .as("text"))
      .localCheckpoint(true)

    def timeIt(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n > 0); (System.nanoTime() - t0) / 1e9
    }

    // learn once at full budget (batch=8 — the round-trip-batched form)
    val t0 = System.nanoTime()
    val table = graft.operators.Curation.learnBpeMerges(
        docs.limit(20000), "text", rounds = maxMerges, minFreq = 1,
        batch = 8)
      .orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val tLearn8 = (System.nanoTime() - t0) / 1e9
    println(s"""{"probe":"s140_learn","batch":8,"rules":${table.size},""" +
      s""""sec":$tLearn8}""")
    val tLearn1 = timeIt {
      graft.operators.Curation.learnBpeMerges(
        docs.limit(20000), "text", rounds = 200, minFreq = 1).count()
    }
    println(s"""{"probe":"s140_learn","batch":1,"rules":200,""" +
      s""""sec":$tLearn1}""")

    // encode arms: prefix slices of the learned table, interleaved
    val slices = Seq(10, 100, 1000, table.size).distinct
      .filter(_ <= table.size)
    val minima = scala.collection.mutable.Map.empty[Int, Double]
    (1 to reps).foreach { _ =>
      slices.foreach { m =>
        spark.sparkContext.setJobDescription(s"s140 encode m=$m")
        val sec = timeIt {
          graft.operators.Curation.applyBpeMerges(
            docs, "doc_id", "text", table.take(m)).count()
        }
        minima(m) = math.min(minima.getOrElse(m, Double.MaxValue), sec)
        System.gc()
      }
    }
    slices.foreach { m =>
      println(s"""{"probe":"s140_encode","merges":$m,"docs":$nDocs,""" +
        s""""min_sec":${minima(m)}}""")
    }
    spark.stop()
  }
}
