package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns. The hot kernels
  * (dot / l2sq) are native Catalyst expressions with fused codegen loops
  * (graft.plans.VectorExpressions) — one pass, zero allocation per pair;
  * the rest is Column algebra over higher-order functions. All reductions
  * are sequential left-to-right, so results are deterministic and match
  * the DuckDB oracle bit-for-bit.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ordering matters). */
  def l2sq(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.l2sq(a, b)

  /** Unit-normalize a vector (null-safe: zero vector stays zero). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, d(a)).otherwise(transform(d(a), x => x / n))
  }

  /** Random-hyperplane LSH bucket id: sign bits of `planes.length` fixed
    * projections packed into a long. Vectors close in cosine land in the
    * same bucket with high probability — the candidate-generation step for
    * ANN at scale (bucket-join instead of all-pairs).
    */
  def rhpBucket(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(d(a), array(p.map(lit): _*), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
