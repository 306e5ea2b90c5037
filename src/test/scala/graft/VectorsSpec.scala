package graft

import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Exact centroid / mean-pool / drift semantics, including the property
  * the whole design exists for: bit-identical results under ANY
  * partitioning (quantized long sums are associative; double sums are
  * not).
  */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f)),
    (0L, Seq(3.0f, 2.0f, 1.0f)),
    (1L, Seq(10.0f, 0.0f, -2.0f)),
    (1L, Seq(0.0f, 10.0f, -4.0f)),
    (1L, Seq(2.0f, 2.0f, 0.0f))
  ).toDF("grp", "embedding")

  test("centroids compute the exact element-wise mean per group") {
    val got = Vectors.centroids(vecs, Seq("grp"), "embedding")
      .orderBy("grp")
      .select("grp", "n_vecs", "centroid")
      .as[(Long, Long, Seq[Double])].collect().toSeq
    assert(got == Seq(
      (0L, 2L, Seq(2.0, 2.0, 2.0)),
      (1L, 3L, Seq(4.0, 4.0, -2.0))))
  }

  test("meanPool collapses chunk vectors to one per id") {
    val pooled = Vectors.meanPool(vecs, "grp", "embedding")
    assert(pooled.count() == 2)
    assert(pooled.columns.toSeq == Seq("grp", "n_vecs", "centroid"))
  }

  test("centroids are bit-identical under any partitioning") {
    // irrational-ish floats whose double sums WOULD depend on add order
    val r = new scala.util.Random(7)
    val big = (1 to 500).map(i =>
      (i % 3L, Seq.fill(8)(r.nextGaussian().toFloat)))
      .toDF("grp", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Vectors.centroids(df, Seq("grp"), "embedding")
        .orderBy("grp").select("grp", "centroid")
        .as[(Long, Seq[Double])].collect().toSeq
    val a = run(big.repartition(1))
    val b = run(big.repartition(13))
    val c = run(big.repartition(32, col("grp")))
    assert(a == b && b == c, "centroid depends on partitioning")
  }

  test("drift is the L2 distance between centroid vectors") {
    val d = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "b")
      .select(Vectors.drift(col("a"), col("b"))).as[Double].head()
    assert(math.abs(d - 5.0) < 1e-12)
  }

  test("vecSumLong handles ragged and null rows") {
    val df = Seq(
      Some(Seq(1L, 2L)),
      Some(Seq(10L, 20L, 30L)), // wider — tail extends
      None
    ).toDF("a")
    val got = df.agg(graft.plans.AggExpressions.vecSumLong(col("a")))
      .as[Seq[Long]].head()
    assert(got == Seq(11L, 22L, 30L))
  }
}
