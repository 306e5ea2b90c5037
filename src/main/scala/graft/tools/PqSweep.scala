package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.Similarity

/** One-off diagnostic: recall@5 of IVF-PQ (ADC and exact-rerank) on the
  * driver embeddings as a function of training iters, ksub, and shortlist.
  * Run: sbt "runMain graft.tools.PqSweep [sfDir]".
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val all = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val truth = all.filter(_._1 < 20).map { case (qid, qv) =>
      qid -> all.filter(_._1 != qid)
        .map { case (cid, cv) => (l2(qv, cv), cid) }
        .sorted.take(5).map(_._2).toSet
    }.toMap
    val oneCell = Seq(Seq.fill(64)(0.0))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size }
        .sum.toDouble / truth.values.map(_.size).sum
    }

    for (iters <- Seq(2, 5, 8); ksub <- Seq(16, 32)) {
      val cb = Similarity.pqTrain(emb, dim = 64, m = 8, ksub = ksub, iters = iters)
      val adc = recall(Similarity.ivfPqKnn(queries, emb, k = 5, oneCell, cb))
      val rs = Seq(50, 100, 200).map { sl =>
        sl -> recall(Similarity.ivfPqKnnRerank(queries, emb, k = 5, oneCell, cb,
          shortlist = sl))
      }
      println(s"[pqsweep] iters=$iters ksub=$ksub adc@5=$adc " +
        rs.map { case (sl, r) => s"rerank@5(sl=$sl)=$r" }.mkString(" "))
    }
    spark.stop()
  }
}
