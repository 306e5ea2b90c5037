package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, pure Column
  * algebra (`zip_with` / `aggregate` higher-order functions — codegen'd,
  * no UDF). Elements are cast to double and reduced left-to-right, so
  * results are deterministic and reproducible across engines.
  */
object VectorFunctions {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt when only ordering matters). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

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
