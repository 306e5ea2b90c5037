package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the bigram-CE build: the r15 single-pass
  * design (persisted edges with last-token sentinels — the SHIPPED
  * `Curation.bigramCrossEntropy`) against a faithful inline copy of the
  * r14 three-scan form (persisted bigram table + separate full-corpus
  * vocabulary job + unpersisted roster re-tokenize). The per-round bench
  * flagged q147 ~1.5× after the refactor with draw widths of the same
  * magnitude; this is the controlled instrument (alternating draws, one
  * JVM, min-of-N — the repo's bench_diff discipline) that separates
  * co-tenant noise from a real constant-factor change.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.BigramProf [draws]
  */
object BigramProf {

  /** The r14 shape, reconstructed: THREE corpus tokenizations. */
  private def oldBuild(df: DataFrame): DataFrame = {
    val base = df.select(col("doc_id").as("id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("id"), size(col("_toks")).as("dl"), col("_toks"))
    val bg = base.filter(col("dl") >= 2)
      .select(col("id"), col("dl"),
        explode(expr("transform(sequence(1, size(_toks) - 1), i -> " +
          "struct(element_at(_toks, i) AS l, " +
          "element_at(_toks, i + 1) AS r))")).as("b"))
      .select(col("id"), col("dl"), col("b.l").as("l"), col("b.r").as("r"))
      .groupBy(col("id"), col("dl"), col("l"), col("r"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bf = bg.groupBy(col("l"), col("r")).agg(sum(col("tf")).as("bf"))
    val model = bf.join(
      bf.groupBy(col("l")).agg(sum(col("bf")).as("lcnt")), "l")
    val vocabN = df.select(
        explode(graft.functions.TextAnalysis.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t")).as("v")).head().getLong(0)
    val mstats = model.agg(count(lit(1)).as("n"),
      sum(octet_length(col("l")) + octet_length(col("r"))).as("b")).head()
    val estBytes = (if (mstats.isNullAt(1)) 0L else mstats.getLong(1)) +
      mstats.getLong(0) * 64L
    val modelSide =
      if (estBytes <= (64L << 20)) broadcast(model) else model
    val scored = bg.join(modelSide, Seq("l", "r"))
      .withColumn("_nll", col("tf").cast("double") *
        -log((col("bf").cast("double") + 1.0) /
          (col("lcnt").cast("double") + vocabN.toDouble + 1.0)))
    val perDoc = scored.groupBy(col("id"), col("dl"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("l"), col("r"), col("_nll")))),
        lit(0.0), (acc, s) => acc + s.getField("_nll")).as("_sum"))
      .select(col("id"),
        round(col("_sum") / (col("dl") - 1).cast("double"), 6).as("ce"))
    val result = base.select(col("id"), col("dl"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"), col("dl").cast("long").as("n_tokens"),
        greatest(col("dl") - 1, lit(0)).cast("long").as("n_bigrams"),
        coalesce(col("ce"), lit(0.0)).as("ce"))
    try result.localCheckpoint(true) finally bg.unpersist(true)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val draws = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)

    def newForm(): Long =
      graft.operators.Curation.bigramCrossEntropyScoped(docs, "doc_id",
        "text")(_.count())
    def oldForm(): Long = {
      val r = oldBuild(docs)
      val n = r.count()
      n
    }
    // warm both codegen paths once
    newForm(); oldForm()
    def draw(f: () => Long): Double = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(500)
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val (na, ob) = (Array.fill(draws)(0.0), Array.fill(draws)(0.0))
    for (i <- 0 until draws) { // interleaved: A B A B ...
      na(i) = draw(newForm _)
      ob(i) = draw(oldForm _)
    }
    println(f"[bigramprof] new(min/med) = ${na.min}%.3f/" +
      f"${na.sorted.apply(draws / 2)}%.3f  " +
      f"old(min/med) = ${ob.min}%.3f/${ob.sorted.apply(draws / 2)}%.3f  " +
      f"ratio(min) = ${na.min / ob.min}%.2f  draws = $draws")
  }
}
