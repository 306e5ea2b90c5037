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

  test("powerIterationTrace converges to a planted dominant direction " +
    "and is bit-identical under any partitioning") {
    // 200 vectors along ±e1 (norm 10) + 20 small noise vectors: the top
    // principal direction of sum(x x^T) is e1 by construction
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      Seq(10.0 * sign, rnd.nextGaussian() * 0.01,
        rnd.nextGaussian() * 0.01, rnd.nextGaussian() * 0.01)
    } ++ (0 until 20).map(_ => Seq.fill(4)(rnd.nextGaussian() * 0.1))
    val df = rows.map(v => Tuple1(v)).toDF("embedding")
    val trace = graft.operators.Vectors.powerIterationTrace(
      df, "embedding", dims = 4, iters = 4)
    assert(trace.size == 4)
    val (vLast, lamLast) = trace.last
    assert(math.abs(math.abs(vLast.head) - 1.0) < 1e-3,
      s"did not converge to e1: $vLast")
    assert(vLast.tail.forall(c => math.abs(c) < 0.05), s"off-axis: $vLast")
    // eigenvalue estimate ~ sum of squared projections onto e1 = 200*100
    assert(math.abs(lamLast - 20000.0) / 20000.0 < 0.01, s"lambda $lamLast")
    // every iterate is a unit vector
    trace.foreach { case (v, _) =>
      val n = math.sqrt(v.map(c => c * c).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"iterate not unit: $n")
    }
    // exact partition-independence: the quantized long sums make the
    // whole trace (a chain of float-sensitive steps) bit-stable
    val re = graft.operators.Vectors.powerIterationTrace(
      df.repartition(7), "embedding", dims = 4, iters = 4)
    assert(re == trace, "trace depends on partitioning")
  }
}
