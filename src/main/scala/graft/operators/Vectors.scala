package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.AggExpressions

/** Embedding-column reductions: group centroids (mean-pool) and centroid
  * drift — the monitoring/aggregation layer over the ANN operators.
  *
  * Determinism design: a distributed float mean depends on partial-
  * aggregation row order, so the same data can hash differently between
  * two runs — let alone between Spark and the DuckDB oracle. [[centroids]]
  * therefore quantizes each element to fixed-point longs (×2^scaleBits is
  * EXACT in doubles — a power-of-two scale shifts the exponent without
  * touching the mantissa) and sums with the native mergeable
  * [[graft.plans.VectorSumLong]]: long addition is associative, so the
  * result is bit-stable across partitionings, AQE re-plans, and engines.
  * The quantization error is bounded by 2^-(scaleBits+1) per element —
  * pick scaleBits for the precision the embedding actually carries
  * (float32 has 24 mantissa bits; the default 20 fractional bits is
  * lossless for normalized-ish embeddings printed to 6 decimals).
  *
  * Scale: one hash aggregation; state is one long per dimension per group
  * and the vector never explodes into dim× rows. The shuffle carries
  * |groups| × dim longs per map partition — partial aggregation does the
  * heavy lifting map-side.
  */
object Vectors {

  /** Per-group element-wise centroid of a vector column: returns the
    * grouping columns plus `n_vecs` and `centroid` (array<double>, each
    * element rounded to 6 decimals).
    */
  def centroids(df: DataFrame, groupCols: Seq[String], vecCol: String,
                scaleBits: Int = 20): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 40, "scaleBits in [1, 40]")
    val scale = (1L << scaleBits).toDouble
    val quantized = transform(col(vecCol).cast("array<double>"),
      x => round(x * scale).cast("long"))
    df.groupBy(groupCols.map(col): _*)
      .agg(AggExpressions.vecSumLong(quantized).as("_sums"),
        count(lit(1)).as("n_vecs"))
      .withColumn("centroid", transform(col("_sums"),
        s => round(s.cast("double") / col("n_vecs") / scale, 6)))
      .drop("_sums")
  }

  /** Mean-pooling is a centroid keyed by the pooling id (e.g. collapse
    * chunk embeddings to one document embedding).
    */
  def meanPool(df: DataFrame, idCol: String, vecCol: String,
               scaleBits: Int = 20): DataFrame =
    centroids(df, Seq(idCol), vecCol, scaleBits)

  /** ENGINE-EXACT distributed power iteration: the top principal
    * direction of the (uncentered) second-moment matrix A = Σᵢ xᵢxᵢᵀ —
    * the embedding-space anisotropy / dominant-direction diagnostic
    * (Mu & Viswanath 2018 "All-but-the-Top": real embedding corpora
    * concentrate mass on a few directions; knowing the top one is the
    * first data-QA step before cosine-based dedup or retrieval).
    *
    * Each iteration is ONE map pass + ONE bounded aggregation:
    * sᵢ = xᵢ·v (native fused kernel), per-row contribution
    * round(xᵢ[d]·sᵢ·2^scaleBits) quantized to longs, summed with the
    * mergeable exact [[graft.plans.VectorSumLong]] — so w = quantize(A·v)
    * is BIT-STABLE across partitionings and engines ([[centroids]]'s
    * determinism recipe applied to a matvec), and the driver-side
    * normalize (left-fold sum of squares, element division) is scalar
    * IEEE arithmetic any engine replays. v₀ = (1/√dims, ...) — exact
    * when dims is a power of four (1/√64 = 0.125).
    *
    * Returns the iterate after EACH iteration (unit vectors) plus the
    * pre-normalization quantized-matvec norm (÷2^scaleBits ≈ the
    * Rayleigh eigenvalue estimate once v converges).
    *
    * Scale: O(iters) linear passes, driver state = dims longs — the
    * Krylov matvec building block at 100 TB. Long-sum headroom: per-row
    * contributions are ≤ |x|·|s|·2^scaleBits; with the default 20 bits
    * and float-ish embeddings that is ~2²⁴ per row, so sums stay inside
    * a long past 2³⁸ rows per dimension.
    */
  def powerIterationTrace(df: DataFrame, vecCol: String, dims: Int,
                          iters: Int, scaleBits: Int = 20)
      : Seq[(Seq[Double], Double)] = {
    require(dims >= 1 && iters >= 1, "dims, iters >= 1")
    require(scaleBits >= 1 && scaleBits <= 40, "scaleBits in [1, 40]")
    val scale = (1L << scaleBits).toDouble
    val x = col(vecCol).cast("array<double>")
    var v: Seq[Double] = Seq.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[Double], Double)]
    var it = 0
    while (it < iters) {
      val s = VectorFunctions.dot(x, typedLit(v))
      val contrib = transform(x, e => round(e * s * scale).cast("long"))
      val w = df.agg(AggExpressions.vecSumLong(contrib)).head()
        .getSeq[Long](0)
      require(w.size == dims, s"vector column is ${w.size}-dim, not $dims")
      val norm = math.sqrt(
        w.foldLeft(0.0)((acc, e) => acc + e.toDouble * e.toDouble))
      v = w.map(_.toDouble / norm)
      out += ((v, norm / scale))
      it += 1
    }
    out.toSeq
  }

  /** L2 distance between two (deterministically computed) centroid
    * columns — e.g. each group's centroid vs the global one, the standard
    * embedding-drift monitor. Sequential fused fold
    * ([[VectorFunctions.l2sq]]), bit-identical to the oracle's
    * `list_inner_product` of the element differences.
    */
  def drift(a: Column, b: Column): Column =
    sqrt(VectorFunctions.l2sq(a, b))
}
