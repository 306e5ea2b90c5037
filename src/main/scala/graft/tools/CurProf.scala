package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Dedup}

/** Dev probe: stage-by-stage timing of the q79 contamination pipeline. */
object CurProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[curprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    time("warm scan")(docs.count())
    val corpusSets = Dedup.hashedShingleSets(corpus, "doc_id", "text", 4)
    time("corpusSets count x2")(corpusSets.count())
    time("corpusSets sum sizes")(
      corpusSets.agg(sum(size(col("shingles")))).collect())
    val benchGrams = Dedup.hashedShingleSets(bench, "doc_id", "text", 4)
      .select(explode(col("shingles")).as("g")).distinct()
    time("benchGrams count")(benchGrams.count())
    val exploded = corpusSets.select(col("id"),
      size(col("shingles")).as("n_shingles"), explode(col("shingles")).as("g"))
    time("exploded count")(exploded.count())
    val joined = exploded.join(broadcast(benchGrams), Seq("g"))
    time("joined count")(joined.count())
    time("full report")(Curation.contaminationReport(
      corpus, bench, "doc_id", "text", 4, 0.05).count())
    time("full report again")(Curation.contaminationReport(
      corpus, bench, "doc_id", "text", 4, 0.05).count())
    // same INSTANCE twice: if run 2 is fast, the cost is Janino compile
    // (fresh lambda exprIds defeat the codegen cache across instances)
    val inst = Curation.contaminationReport(
      corpus, bench, "doc_id", "text", 4, 0.05)
    time("same instance run 1")(inst.count())
    time("same instance run 2")(inst.count())
    println(exploded.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
