package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact; O(|Q| x |C|) — the
  * correctness oracle). Scale paths:
  *   - [[lshKnn]]: random-hyperplane LSH buckets both sides, joins on
  *     bucket id, ranks within candidates — turns the cross join into an
  *     equi-join whose shuffle carries bucket ids;
  *   - [[ivfKnn]]: IVF-style coarse quantization — assign every vector to
  *     its nearest of `nCentroids` seed centroids, probe only matching
  *     cells.
  * Both are recall<1 by construction; the exact top-k remains the baseline
  * for tests.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself), ranked by similarity desc with id as the
    * deterministic tie-break. Broadcast the query side when it is small —
    * at cluster scale that makes this a map-only pass over the corpus.
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    broadcastQueries: Boolean = true): DataFrame = {
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val q = if (broadcastQueries) broadcast(q0) else q0
    // widen: a small corpus file scans as one split, serializing the
    // |Q|x|C| dot products on one core; see Partitioning.widen
    val c = Partitioning.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs (the vector-space member of the
    * dedup family): all (a < b) pairs with cosine >= threshold. Exact
    * all-pairs baseline; the scale path buckets both sides with
    * [[graft.functions.VectorFunctions.rhpBucket]] first (same shape as
    * [[lshKnn]]) so candidates come from an equi-join.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val wdf = Partitioning.widen(df)
    val a = wdf.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = wdf.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Random-hyperplane LSH ANN: vectors sharing a `planes.length`-bit
    * bucket in ANY of the hash tables are candidates; rank within the
    * deduplicated candidate set. Multiple independent tables
    * (`tables.size` > 1) are the standard recall lever — a true neighbor
    * only needs to collide once. Deterministic given the plane sets.
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Seq[Seq[Double]],
             idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    lshKnnMultiTable(queries, corpus, k, Seq(planes), idCol, vecCol)

  /** Multi-table variant of [[lshKnn]]: one (table, bucket) pair per hash
    * table, candidates via an equi-join on both, deduplicated before the
    * cosine ranking so each candidate is scored once.
    */
  def lshKnnMultiTable(queries: DataFrame, corpus: DataFrame, k: Int,
                       tables: Seq[Seq[Seq[Double]]],
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array(tables.zipWithIndex.map { case (planes, t) =>
          struct(lit(t).as("t"), rhpBucket(col(vecCol), planes).as("b"))
        }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.t").as("t"), col("tb.b").as("b"))
    val q = bucketed(queries, "query_id", "qv")
    val c = bucketed(Partitioning.widen(corpus), "neighbor_id", "cv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Scale path for [[cosineNearDupPairs]]: multi-table random-hyperplane
    * bucketing on both sides, candidates from an equi-join on
    * (table, bucket), exact cosine check on the candidate set. Same
    * contract as MinHash-LSH text dedup: may only MISS pairs (recall
    * rises with table count), never emits a false positive — every
    * output pair truly clears `threshold`.
    */
  def cosineNearDupPairsBucketed(df: DataFrame, threshold: Double,
                                 tables: Seq[Seq[Seq[Double]]],
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding"): DataFrame = {
    val wdf = Partitioning.widen(df)
    def bucketed(id: String, vec: String) =
      wdf.select(col(idCol).as(id), col(vecCol).as(vec),
        explode(array(tables.zipWithIndex.map { case (planes, t) =>
          struct(lit(t).as("t"), rhpBucket(col(vecCol), planes).as("b"))
        }: _*)).as("tb"))
        .select(col(id), col(vec), col("tb.t").as("t"), col("tb.b").as("b"))
    bucketed("id_a", "va").join(bucketed("id_b", "vb"), Seq("t", "b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "va", "id_b", "vb")
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", round(cosine(col("va"), col("vb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Deterministic distributed k-means for IVF centroid training.
    *
    * Two sources of nondeterminism plague distributed k-means, and both
    * are closed here: (a) INIT — seeds are the k vectors with the
    * smallest md5(id) (a content-free deterministic "random" draw, the
    * quota-sample construction), not a random sample; (b) the centroid
    * UPDATE — means run through [[Vectors.centroids]]' fixed-point
    * quantization, so every iteration's centroids are bit-identical under
    * any partitioning. Result: the trained model is a pure function of
    * (data, k, iters) — refitting on a different cluster layout yields
    * the same cells, which is what makes an IVF index reproducible.
    *
    * Scale: each iteration is one map pass (assign: argmin over a
    * typedLit centroid array — same codegen-safe shape as [[ivfKnn]])
    * plus one hash aggregation; only k×dim doubles return to the driver
    * per iteration (the model parameters — they must reach the driver to
    * become the next broadcast literal). Empty cells keep their previous
    * centroid. Runs a FIXED iteration count — no convergence probe, so
    * the job count is known upfront.
    */
  def kmeansFit(df: DataFrame, k: Int, iters: Int = 5,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var centroids: Seq[Seq[Double]] = base
      .withColumn("_h", md5(col("id").cast("string")))
      .orderBy(col("_h").asc, col("id").asc)
      .limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    var it = 0
    while (it < iters) {
      val ctLit = typedLit(centroids.map(_.toSeq))
      val assigned = base
        .withColumn("_dists", transform(ctLit, ct => l2sq(col("v"), ct)))
        .withColumn("cell",
          array_position(col("_dists"), array_min(col("_dists"))))
        .select(col("cell"), col("v"))
      val updated = Vectors.centroids(assigned, Seq("cell"), "v")
        .select(col("cell"), col("centroid")).collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toSeq).toMap
      centroids = (1 to k).map(c => updated.getOrElse(c, centroids(c - 1)))
      it += 1
    }
    centroids
  }

  /** IVF-style ANN: nearest-centroid cell assignment for the corpus;
    * queries probe their `nprobe` nearest cells (multi-probe — recall
    * rises with nprobe at the cost of proportionally more candidates).
    * Candidates come from one equi-join on cell id.
    */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             centroids: Seq[Seq[Double]],
             idCol: String = "vec_id",
             vecCol: String = "embedding",
             nprobe: Int = 1): DataFrame = {
    // argmin via array_min + array_position (first occurrence breaks ties
    // deterministically). Two plan-health rules learned the hard way:
    // (a) NOT a fold of nested when(struct,...) — that duplicates the
    // distance subtrees exponentially; (b) centroids ride as ONE
    // typedLit(array<array<double>>) literal + transform, not 16×64
    // inlined lit() leaves — those bloat the generated code past JIT/
    // janino limits and drop the whole projection to interpreted eval.
    require(nprobe >= 1 && nprobe <= centroids.size, "nprobe in [1, cells]")
    val ctLit = typedLit(centroids.map(_.toSeq))
    def withDists(df: DataFrame, vec: String): DataFrame =
      df.withColumn("_dists", transform(ctLit, ct => l2sq(col(vec), ct)))
    // corpus: single nearest cell (array_position = first min, 1-based)
    val c = withDists(Partitioning.widen(corpus)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "cv")
      .withColumn("cell",
        array_position(col("_dists"), array_min(col("_dists"))))
      .drop("_dists")
    // queries: the nprobe nearest cells — sort (dist, idx) structs so the
    // tie-break matches array_position's first-occurrence rule
    val q = withDists(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv")), "qv")
      .withColumn("cell",
        explode(transform(
          slice(array_sort(transform(
            sequence(lit(1), lit(centroids.size)),
            i => struct(element_at(col("_dists"), i).as("dist"),
              i.as("idx")))), 1, nprobe),
          s => s.getField("idx").cast("long"))))
      .drop("_dists")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
