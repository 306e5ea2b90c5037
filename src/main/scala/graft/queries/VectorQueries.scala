package graft.queries

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Embedding similarity search over `embeddings` (64-dim float vectors).
  *
  * q30 is the exact brute-force baseline with a DuckDB oracle (identical
  * double arithmetic: sequential dot products, same cosine expression
  * shape). q31/q32 are the approximate scale paths (LSH buckets / IVF
  * cells) — Spark-only, recall measured against q30 in ScalaTest.
  */
object VectorQueries {

  private val NumQueries = 100L // query side: vec_id < 100
  private val K = 10

  // ---------------------------------------------------------------- q30
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q30Sql = {
    val dot = "list_inner_product(q.v, c.v)"
    val sim = s"round($dot / (sqrt(list_inner_product(q.v, q.v)) * " +
      "sqrt(list_inner_product(c.v, c.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT * FROM vecs WHERE vec_id < $NumQueries),
       |c AS (SELECT * FROM vecs),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    $sim AS sim
       |  FROM q JOIN c ON q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Deterministic pseudo-random hyperplanes / centroids (fixed seed — the
    * plane set is part of the operator definition, reproducible across
    * runs and cluster sizes).
    */
  private def randPlanes(n: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new Random(seed)
    Seq.fill(n)(Seq.fill(dim)(r.nextGaussian()))
  }

  // ---------------------------------------------------------------- q31
  // The planes are part of the operator definition (fixed seed), so the
  // oracle EMBEDS them as literals and replays the exact bucket assignment:
  // rhpBucket's projection is a sequential left-fold dot product, which is
  // bit-identical to DuckDB's list_inner_product (parity proven by q30).
  private val q31Planes = randPlanes(8, 64, seed = 42L)
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K, planes = q31Planes)
      .orderBy(col("query_id"), col("rank"))
  }

  // Double.toString is the shortest round-trip form — DuckDB parses the
  // literal back to the identical bits.
  private def dlit(p: Seq[Double]): String = p.mkString("[", ",", "]")

  private val q31Sql = {
    val bucket = q31Planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_inner_product(v, ${dlit(p)}) >= 0" +
        s" THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, CAST($bucket AS BIGINT) AS bkt FROM vecs),
       |q AS (SELECT * FROM b WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_inner_product(q.v, c.v)
       |      / (sqrt(list_inner_product(q.v, q.v))
       |         * sqrt(list_inner_product(c.v, c.v))), 6) AS sim
       |  FROM q JOIN b c ON q.bkt = c.bkt AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q32
  // Same constant-embedding trick for the IVF centroids. Cell assignment =
  // FIRST argmin of the squared L2 distances; the oracle expands each
  // distance as an explicit left-associated sum of (v[i]-c_i)^2 so the
  // floating-point accumulation order matches the native l2sq loop exactly,
  // and list_position(first occurrence) mirrors array_position's tie-break.
  private val q32Centroids = randPlanes(16, 64, seed = 7L)

  /** The q32/q104 centroid set, shared with profiling tools (Q104Prof)
    * and the streaming SemDeDup oracle query (StreamingQueries q113).
    */
  def centroidsForProfiling: Seq[Seq[Double]] = q32Centroids

  /** The q105 constant PQ codebooks, shared with profiling tools
    * (Q105Prof) so stage bisection measures the exact registered plan.
    */
  def codebooksForProfiling: Seq[Seq[Seq[Double]]] = q105Codebooks

  /** DuckDB SQL fragment for the squared-L2 distance list to `centroids`
    * — shared with StreamingQueries q113 so the streaming oracle assigns
    * cells with the exact same fp expansion as q32/q103.
    */
  private[queries] def distsSqlShared(centroids: Seq[Seq[Double]]): String =
    distsSqlFor(centroids)
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      centroids = q32Centroids) // nprobe = 1: query cell == corpus argmin
      .orderBy(col("query_id"), col("rank"))
  }

  // Oracle-side replay of the l2sq distance list against the constant
  // centroids: each distance is an explicit left-associated sum of
  // (v[i]-c_i)^2, matching the native loop's accumulation order exactly.
  private def distsSqlFor(centroids: Seq[Seq[Double]]): String = {
    def l2sq(c: Seq[Double]): String =
      c.zipWithIndex.map { case (x, i) =>
        s"(v[${i + 1}]-($x))*(v[${i + 1}]-($x))"
      }.mkString("(", " + ", ")")
    centroids.map(l2sq).mkString("[", ",", "]")
  }

  private val q32Sql = {
    val dists = distsSqlFor(q32Centroids)
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |q AS (SELECT * FROM b WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_inner_product(q.v, c.v)
       |      / (sqrt(list_inner_product(q.v, q.v))
       |         * sqrt(list_inner_product(c.v, c.v))), 6) AS sim
       |  FROM q JOIN b c ON q.cell = c.cell AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q33
  // Embedding-cosine near-dup pairs (vector-space dedup; capped id range
  // keeps the ORACLE's cross join tractable).
  private val NearDupMaxId = 500L
  private val NearDupThreshold = 0.45
  private def q33(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
      Tables.embeddings(s, dir).filter(col("vec_id") < NearDupMaxId),
      NearDupThreshold)
      .orderBy(col("id_a"), col("id_b"))

  private val q33Sql = {
    val sim = "round(list_inner_product(a.v, b.v) / " +
      "(sqrt(list_inner_product(a.v, a.v)) * " +
      "sqrt(list_inner_product(b.v, b.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE vec_id < $NearDupMaxId)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, $sim AS sim
       |FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
       |WHERE $sim >= $NearDupThreshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  // --------------------------------------------------------------- q149
  // The ROUTED embedding near-dup surface (the default deployment entry):
  // exactMaxVectors = 0 forces the RHP-bucketed arm at every scale, and
  // the oracle is the SAME exact-SQL cross join as q33 — pair-set parity
  // with the exact baseline IS the recall proof on this corpus (the
  // geometry below targets recall 0.9995 at the threshold; everything is
  // seeded, so parity is deterministic per scale, the q26 MinHash-LSH
  // gating pattern).
  private def q149(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsRouted(
      Tables.embeddings(s, dir).filter(col("vec_id") < NearDupMaxId),
      NearDupThreshold, exactMaxVectors = 0L, targetRecall = 0.9995)
      .orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q91
  // Exact per-group centroids + drift against the global centroid.
  // Distributed float means are order-dependent, so elements quantize to
  // fixed-point longs (×2^20 — exact in doubles) and sum with the native
  // mergeable VectorSumLong: associative longs make the result bit-equal
  // to DuckDB's no matter how Spark partitions (operators.Vectors).
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select((col("vec_id") % 4).as("grp"), col("embedding"))
    val cents = graft.operators.Vectors.centroids(emb, Seq("grp"),
      "embedding")
    val global = graft.operators.Vectors.centroids(
        emb.select(lit(0L).as("g"), col("embedding")), Seq("g"), "embedding")
      .select(col("centroid").as("_gcent"))
    cents.crossJoin(broadcast(global))
      .withColumn("drift", round(
        graft.operators.Vectors.drift(col("centroid"), col("_gcent")), 6))
      .select(col("grp"), col("n_vecs"), col("drift"),
        posexplode(col("centroid")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("pos"),
        col("n_vecs"), col("col").as("centroid"), col("drift"))
      .orderBy(col("grp"), col("pos"))
  }

  private val q91Sql =
    """WITH e AS (
      |  SELECT vec_id % 4 AS grp,
      |    unnest(generate_series(1, len(embedding))) AS pos,
      |    unnest(list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(round(x * 1048576.0) AS BIGINT))) AS q
      |  FROM embeddings),
      |cg AS (SELECT grp, pos, sum(q) AS s, count(*) AS n
      |       FROM e GROUP BY grp, pos),
      |cent AS (SELECT grp, CAST(pos AS BIGINT) AS pos, n AS n_vecs,
      |         round(CAST(s AS DOUBLE) / n / 1048576.0, 6) AS centroid
      |         FROM cg),
      |gg AS (SELECT pos,
      |         round(CAST(sum(q) AS DOUBLE) / count(*) / 1048576.0, 6)
      |           AS gcent
      |       FROM e GROUP BY pos),
      |dl AS (SELECT c.grp, list(c.centroid - g.gcent ORDER BY c.pos) AS d
      |       FROM cent c JOIN gg g ON c.pos = g.pos GROUP BY c.grp),
      |dr AS (SELECT grp, round(sqrt(list_inner_product(d, d)), 6) AS drift
      |       FROM dl)
      |SELECT c.grp, c.pos, c.n_vecs, c.centroid, dr.drift
      |FROM cent c JOIN dr USING (grp)
      |ORDER BY grp, pos""".stripMargin

  // ---------------------------------------------------------------- q92
  // Per-vector L2 normalization, exploded to rows. The norm is the
  // sequential fused dot — bit-identical to list_inner_product (the
  // parity primitive q30 already proves).
  private def q92(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    Tables.embeddings(s, dir).filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("_nrm", VectorFunctions.norm(col("v")))
      .select(col("vec_id"), col("_nrm"), posexplode(col("v")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("pos"),
        round(when(col("_nrm") === 0.0, 0.0)
          .otherwise(col("col") / col("_nrm")), 6).as("nval"),
        round(col("_nrm"), 6).as("norm"))
      .orderBy(col("vec_id"), col("pos"))
  }

  private val q92Sql =
    s"""WITH v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |  WHERE vec_id < $NumQueries),
       |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm
       |      FROM v),
       |e AS (SELECT vec_id, nrm, v,
       |        unnest(generate_series(1, len(v))) AS pos
       |      FROM n)
       |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
       |  round(CASE WHEN nrm = 0 THEN 0.0 ELSE v[pos] / nrm END, 6)
       |    AS nval,
       |  round(nrm, 6) AS norm
       |FROM e
       |ORDER BY vec_id, pos""".stripMargin

  // ---------------------------------------------------------------- q97
  // SemDeDup (Abbas et al., 2023): coarse cells (the q32 constant
  // centroids, so the oracle replays the identical assignment), then
  // within-cell cosine near-dup with min-id canonical retention. dup_of
  // coalesces to -1: the cross-engine hash compare is only byte-stable
  // without NULLs (see RelationalQueries q48 note).
  private val SemDedupThreshold = 0.4
  private def q97(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(s, dir), q32Centroids,
        SemDedupThreshold)
      .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
      .orderBy(col("vec_id"))

  private val q97Sql = {
    val dists = distsSqlFor(q32Centroids)
    val sim = "round(list_inner_product(x.v, y.v) / " +
      "(sqrt(list_inner_product(x.v, x.v)) * " +
      "sqrt(list_inner_product(y.v, y.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |dups AS (
       |  SELECT y.vec_id AS vec_id, MIN(x.vec_id) AS dup_of
       |  FROM b x JOIN b y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE $sim >= $SemDedupThreshold
       |  GROUP BY y.vec_id)
       |SELECT b.vec_id, CAST(b.cell AS BIGINT) AS cell,
       |  coalesce(d.dup_of, -1) AS dup_of, d.dup_of IS NULL AS kept
       |FROM b LEFT JOIN dups d ON b.vec_id = d.vec_id
       |ORDER BY b.vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q103
  // SemDeDup INCREMENT (the streaming micro-batch body, q97 semantics):
  // the even-id half of the corpus is the accumulated assignment
  // snapshot, the odd half is the incoming batch — each odd vector is a
  // dup iff some same-cell vector with a smaller id (snapshot or batch)
  // clears the threshold.
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val prior = Similarity.assignCells(
      emb.filter(col("vec_id") % 2 === 0), q32Centroids,
      "vec_id", "embedding")
    Similarity.semDedupIncrement(prior,
        emb.filter(col("vec_id") % 2 === 1), q32Centroids,
        SemDedupThreshold)
      .withColumn("dup_of", coalesce(col("dup_of"), lit(-1L)))
      .orderBy(col("vec_id"))
  }

  private val q103Sql = {
    val dists = distsSqlFor(q32Centroids)
    val sim = "round(list_inner_product(x.v, y.v) / " +
      "(sqrt(list_inner_product(x.v, x.v)) * " +
      "sqrt(list_inner_product(y.v, y.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |odd AS (SELECT * FROM b WHERE vec_id % 2 = 1),
       |cand AS (SELECT * FROM b WHERE vec_id % 2 = 0
       |         UNION ALL SELECT * FROM odd),
       |dups AS (
       |  SELECT y.vec_id AS vec_id, MIN(x.vec_id) AS dup_of
       |  FROM cand x JOIN odd y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE $sim >= $SemDedupThreshold
       |  GROUP BY y.vec_id)
       |SELECT o.vec_id, CAST(o.cell AS BIGINT) AS cell,
       |  coalesce(d.dup_of, -1) AS dup_of, d.dup_of IS NULL AS kept
       |FROM odd o LEFT JOIN dups d ON o.vec_id = d.vec_id
       |ORDER BY o.vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q162
  // Cluster-quota corpus balancing: nearest-centroid assignment (the
  // q32/q103 fp-exact cell oracle) composed with the q83 deterministic
  // md5-order draw, capped per cell — the SemDeDup-adjacent diversity
  // rebalance. Every row is emitted with its verdict plus the cell's
  // population, so the gate pins assignment, per-cell ordering, the cap,
  // and the drop accounting in one row shape.
  private def q162(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterQuotaBalance(
        Tables.embeddings(s, dir), q32Centroids, quota = 10)
      .orderBy(col("vec_id"))

  private val q162Sql = {
    val dists = distsSqlFor(q32Centroids)
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |rk AS (
       |  SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       |    count(*) OVER (PARTITION BY cell) AS cell_n,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
       |      AS cell_rank
       |  FROM b)
       |SELECT vec_id, cell, cell_n, cell_rank, cell_rank <= 10 AS kept
       |FROM rk ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q163
  // END-TO-END curation-balance composition (q146/q157's shape for the
  // r16 operators): gopher quality rules (q125 config) → broadcast-Bloom
  // decontamination against the benchmark slice (q159 config) →
  // cluster-quota balancing of the survivors over embedding cells (q162
  // config), emitted as ONE funnel row per train document with sentinel
  // -1s where a stage never ran (dropped earlier, or no embedding). The
  // oracle replays all three stages closed-form from the same tables, so
  // a hash match gates the composition contract: each stage consumes
  // exactly the previous stage's survivors, and the final kept set is
  // reproducible end to end.
  private def q163(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val quality = Curation.gopherQualityFilter(train, "doc_id", "text",
        minWords = 20, maxWords = 90,
        minMeanWordLen = 3.9, maxMeanWordLen = 5.1,
        minUniqueFrac = 0.35, minStopwordFrac = 0.02,
        stopwords = Seq("the", "a"))
      .select(col("doc_id"), col("keep").as("quality_keep"))
    val decon = Curation.bloomContaminationReport(train, bench,
        "doc_id", "text", n = 4, mBits = 1 << 22, k = 3,
        flagThreshold = 0.05)
      .select(col("id").as("doc_id"), col("contaminated"))
    val surv = quality.join(decon, "doc_id")
      .withColumn("survives", col("quality_keep") && !col("contaminated"))
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val balanced = Similarity.clusterQuotaBalance(
        surv.filter(col("survives")).join(emb, "doc_id"),
        q32Centroids, quota = 10, idCol = "doc_id")
      .select(col("vec_id").as("doc_id"), col("cell"),
        col("cell_rank"), col("kept"))
    surv.join(balanced, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_keep"), col("contaminated"),
        coalesce(col("cell"), lit(-1L)).as("cell"),
        coalesce(col("cell_rank"), lit(-1)).as("cell_rank"),
        coalesce(col("kept"), lit(false)).as("kept"))
      .orderBy(col("doc_id"))
  }

  private val q163Sql = {
    val dists = distsSqlFor(q32Centroids)
    val toks = """string_split_regex(trim(text), '\s+')"""
    val grams =
      s"""list_distinct(list_transform(
         |    generate_series(1, greatest(len($toks) - 3, 0)),
         |    i -> concat_ws(' ', $toks[i], $toks[i+1],
         |                   $toks[i+2], $toks[i+3])))""".stripMargin
    def pos(g: String) =
      s"""CAST(concat('0x', substr(md5($g || '#' || CAST(i AS VARCHAR)),
         |      1, 15)) AS BIGINT) % 4194304""".stripMargin
    s"""WITH t AS (SELECT doc_id, $toks AS tks FROM documents
       |           WHERE doc_id % 20 != 0),
       |qm AS (
       |  SELECT doc_id,
       |    len(tks) AS n_words,
       |    CAST(list_sum(list_transform(tks, x -> CAST(length(x) AS
       |      BIGINT))) AS DOUBLE) / CAST(greatest(len(tks), 1) AS DOUBLE)
       |      AS mwl,
       |    CAST(len(list_distinct(tks)) AS DOUBLE)
       |      / CAST(greatest(len(tks), 1) AS DOUBLE) AS uf,
       |    CAST(len(list_filter(tks, w -> list_contains(['the','a'], w)))
       |      AS DOUBLE) / CAST(greatest(len(tks), 1) AS DOUBLE) AS sf
       |  FROM t),
       |qual AS (
       |  SELECT doc_id,
       |    ((n_words >= 20 AND n_words <= 90) AND (mwl >= 3.9 AND
       |      mwl <= 5.1) AND uf >= 0.35 AND sf >= 0.02) AS quality_keep
       |  FROM qm),
       |g AS (SELECT doc_id, $grams AS grams FROM documents),
       |idx AS (SELECT unnest([0, 1, 2]) AS i),
       |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
       |          WHERE doc_id % 20 = 0),
       |setbits AS (SELECT DISTINCT ${pos("gram")} AS pos
       |            FROM bench CROSS JOIN idx),
       |corpus AS (SELECT doc_id, unnest(grams) AS gram FROM g
       |           WHERE doc_id % 20 != 0),
       |cp AS (SELECT doc_id, gram, ${pos("gram")} AS pos
       |       FROM corpus CROSS JOIN idx),
       |hitg AS (SELECT doc_id, gram FROM cp JOIN setbits USING (pos)
       |         GROUP BY doc_id, gram HAVING count(*) = 3),
       |hits AS (SELECT doc_id, count(*) AS nh FROM hitg GROUP BY doc_id),
       |tot AS (SELECT doc_id, len(grams) AS nsh FROM g
       |        WHERE doc_id % 20 != 0),
       |dec AS (
       |  SELECT t2.doc_id,
       |    CAST(coalesce(h.nh, 0) AS DOUBLE)
       |      / CAST(greatest(t2.nsh, 1) AS DOUBLE) >= 0.05 AS contaminated
       |  FROM tot t2 LEFT JOIN hits h USING (doc_id)),
       |surv AS (
       |  SELECT q2.doc_id, q2.quality_keep, d.contaminated,
       |    q2.quality_keep AND NOT d.contaminated AS survives
       |  FROM qual q2 JOIN dec d USING (doc_id)),
       |vecs AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
       |         FROM embeddings),
       |cells AS (
       |  SELECT doc_id, list_position(dists, list_min(dists)) AS cell
       |  FROM (SELECT sv.doc_id, $dists AS dists
       |        FROM surv sv JOIN vecs USING (doc_id) WHERE sv.survives)),
       |rk AS (
       |  SELECT doc_id, CAST(cell AS BIGINT) AS cell,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
       |      AS cell_rank
       |  FROM cells)
       |SELECT s.doc_id, s.quality_keep, s.contaminated,
       |  coalesce(r.cell, -1) AS cell,
       |  coalesce(r.cell_rank, -1) AS cell_rank,
       |  coalesce(r.cell_rank <= 10, FALSE) AS kept
       |FROM surv s LEFT JOIN rk r USING (doc_id)
       |ORDER BY s.doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q104
  // Adaptive IVF probing (the q99 diagnostic turned recall lever): each
  // query walks its distance-ordered cells and probes while the PRIOR
  // cells' cumulative population is under the budget (first cell always
  // probed — same prefix rule as the Column-side fold). Budget is
  // corpus-derived (|corpus| // 8, floor, min 1) so the query is
  // scale-free; cell counts come from the same single-scan rollup
  // ivfCellStats uses. The probe-set choice is deterministic: cells
  // sort by (dist, idx) on both engines.
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val counts = Similarity.ivfCellStats(emb, q32Centroids)
      .select(col("cell"), col("n_vecs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budget = math.max(counts.values.sum / 8L, 1L)
    Similarity.ivfKnnAdaptive(
        emb.filter(col("vec_id") < NumQueries), emb, K,
        q32Centroids, counts, candidateBudget = budget)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q104Sql = {
    val dists = distsSqlFor(q32Centroids)
    val nCells = q32Centroids.size
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |counts AS (SELECT cell, count(*) AS n FROM b GROUP BY cell),
       |budget AS (SELECT GREATEST(count(*) // 8, 1) AS cap FROM vecs),
       |q AS (SELECT vec_id, v, $dists AS dists FROM vecs
       |      WHERE vec_id < $NumQueries),
       |percell AS (
       |  SELECT q.vec_id AS query_id, q.v, t.i AS cell, q.dists[t.i] AS dist,
       |    coalesce(c.n, 0) AS n
       |  FROM q, generate_series(1, $nCells) AS t(i)
       |  LEFT JOIN counts c ON c.cell = t.i),
       |probe AS (
       |  SELECT query_id, v, cell FROM (
       |    SELECT query_id, v, cell,
       |      coalesce(sum(n) OVER (PARTITION BY query_id
       |        ORDER BY dist, cell
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |        AS prior
       |    FROM percell)
       |  WHERE prior < (SELECT cap FROM budget)),
       |scored AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id,
       |    round(list_inner_product(p.v, c.v)
       |      / (sqrt(list_inner_product(p.v, p.v))
       |         * sqrt(list_inner_product(c.v, c.v))), 6) AS sim
       |  FROM probe p JOIN b c ON p.cell = c.cell
       |    AND p.query_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, sim
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q99
  // IVF cell-balance diagnostic over the same constant-centroid model.
  // Mean d2 sums fixed-point longs (×2^20, the q91 quantization) so the
  // distributed mean is bit-equal to DuckDB's regardless of partitioning;
  // min/max pick existing doubles (no accumulation).
  private def q99(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfCellStats(Tables.embeddings(s, dir), q32Centroids)
      .orderBy(col("cell"))

  private val q99Sql = {
    val dists = distsSqlFor(q32Centroids)
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT list_position(dists, list_min(dists)) AS cell,
       |        list_min(dists) AS d2
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs))
       |SELECT CAST(cell AS BIGINT) AS cell, count(*) AS n_vecs,
       |  round(CAST(sum(CAST(round(d2 * 1048576.0) AS BIGINT)) AS DOUBLE)
       |    / count(*) / 1048576.0, 6) AS mean_d2,
       |  round(min(d2), 6) AS min_d2,
       |  round(max(d2), 6) AS max_d2
       |FROM b GROUP BY cell
       |ORDER BY cell""".stripMargin
  }

  // --------------------------------------------------------------- q105
  // IVF-PQ / ADC (Jégou et al. 2011; FAISS IVFADC, by_residual=false):
  // corpus vectors quantize to one byte-ish code per 16-dim subspace
  // against CONSTANT codebooks (same fixed-seed trick as q31/q32 — the
  // codebook is part of the operator definition, so the oracle embeds it
  // and replays code assignment + the per-query lookup table verbatim).
  // The subspace distance list serves both sides: its argmin is the
  // corpus code, the list itself is the query's LUT row — so the oracle
  // computes ONE expression set and the asymmetric distance is pure list
  // indexing. Spark's ADC fold is left-associated over subspaces,
  // matching SQL's infix sum; l2sq parity is the q32-proven kernel.
  private val PqM = 4 // 64 dims -> 4 subspaces of 16
  private val PqKsub = 8
  private val q105Codebooks: Seq[Seq[Seq[Double]]] =
    (0 until PqM).map(j => randPlanes(PqKsub, 16, seed = 70L + j))

  private def q105(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfPqKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      centroids = q32Centroids, codebooks = q105Codebooks)
      .orderBy(col("query_id"), col("rank"))
  }

  private val q105Sql = {
    val coarse = distsSqlFor(q32Centroids)
    // subspace j's distance list: l2sq of v[off+1..off+16] vs each
    // sub-centroid, expanded left-associated like the native kernel
    def subDists(j: Int): String = {
      val off = j * 16
      q105Codebooks(j).map { c =>
        c.zipWithIndex.map { case (x, i) =>
          s"(v[${off + i + 1}]-($x))*(v[${off + i + 1}]-($x))"
        }.mkString("(", " + ", ")")
      }.mkString("[", ",", "]")
    }
    val subCols = (0 until PqM).map(j => s"${subDists(j)} AS t${j + 1}")
      .mkString(",\n    ")
    val codeCols = (1 to PqM).map(j =>
      s"list_position(t$j, list_min(t$j)) AS c$j").mkString(", ")
    val adc = (1 to PqM).map(j => s"q.t$j[c.c$j]").mkString(" + ")
    val tCols = (1 to PqM).map(j => s"t$j").mkString(", ")
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |expanded AS (
       |  SELECT vec_id, list_position(cd, list_min(cd)) AS cell,
       |    $codeCols,
       |    $tCols
       |  FROM (SELECT vec_id, $coarse AS cd,
       |    $subCols
       |  FROM vecs)),
       |q AS (SELECT * FROM expanded WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round($adc, 6) AS adist
       |  FROM q JOIN expanded c ON q.cell = c.cell
       |    AND q.vec_id <> c.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY adist ASC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, rank, neighbor_id, adist
       |FROM ranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  // --------------------------------------------------------------- q127
  // Prototypicality pruning (SSL-prototypes / D4): rank vectors within
  // their cell by rounded distance-to-centroid (the q32-proven l2sq
  // expansion + argmin cell rule), drop the closest 25%. The oracle
  // replays rank, cell size, and the ceil() keep boundary closed-form.
  private def q127(s: SparkSession, dir: String): DataFrame =
    Similarity.prototypicalityPrune(
        Tables.embeddings(s, dir), q32Centroids, dropFrac = 0.25)
      .orderBy(col("vec_id"))

  private val q127Sql = {
    val dists = distsSqlFor(q32Centroids)
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id,
       |        list_position(dists, list_min(dists)) AS cell,
       |        round(list_min(dists), 6) AS d2
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |r AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell, d2,
       |        row_number() OVER (PARTITION BY cell
       |                           ORDER BY d2 ASC, vec_id ASC)
       |          AS proto_rank,
       |        count(*) OVER (PARTITION BY cell) AS n_cell
       |      FROM b)
       |SELECT vec_id, cell, d2, proto_rank, n_cell,
       |  proto_rank > CAST(ceil(0.25 * n_cell) AS BIGINT) AS kept
       |FROM r ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q128
  // Semantic benchmark decontamination: the embedding-space complement
  // of q79's n-gram report — train vectors (vec_id % 20 != 0) whose
  // same-cell cosine to any "benchmark" vector (vec_id % 20 == 0)
  // reaches 0.35. Same centroid model and cosine fp expansion as
  // q32/q113; the oracle restates the flag set closed-form.
  private def q128(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.semanticContamination(
        emb.filter(col("vec_id") % 20 =!= 0),
        emb.filter(col("vec_id") % 20 === 0),
        q32Centroids, threshold = 0.32)
      .orderBy(col("vec_id"))
  }

  private val q128Sql = {
    val dists = distsSqlFor(q32Centroids)
    val sim = "round(list_inner_product(t.v, bn.v) / " +
      "(sqrt(list_inner_product(t.v, t.v)) * " +
      "sqrt(list_inner_product(bn.v, bn.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |        list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |t AS (SELECT * FROM b WHERE vec_id % 20 <> 0),
       |bn AS (SELECT * FROM b WHERE vec_id % 20 = 0),
       |hits AS (
       |  SELECT t.vec_id, CAST(t.cell AS BIGINT) AS cell,
       |    bn.vec_id AS bench_id, $sim AS sim
       |  FROM t JOIN bn ON t.cell = bn.cell
       |  WHERE $sim >= 0.32)
       |SELECT vec_id, cell, min(bench_id) AS contaminated_by,
       |  count(*) AS n_hits, max(sim) AS max_sim
       |FROM hits GROUP BY vec_id, cell
       |ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q150
  // The DEPLOYMENT shape of q128: a FROZEN benchmark snapshot (built
  // once via benchmarkSnapshot — the frozen-LM q101/q120 pattern) with
  // the benchmark capped to a FIXED id range (vec_id < 20000 covers the
  // same ids at every soak scale from ×10 up, so the benchmark stops
  // growing with the corpus and the probe is linear — SCALE.md s128).
  // At driver test scales the cap is not binding, so the oracle is
  // q128's closed form with the same cap spliced into the bench CTE.
  private val FixedBenchMaxId = 20000L
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val snapshot = Similarity.benchmarkSnapshot(
      emb.filter(col("vec_id") % 20 === 0)
        .filter(col("vec_id") < FixedBenchMaxId), q32Centroids)
    Similarity.semanticContaminationAgainst(
        emb.filter(col("vec_id") % 20 =!= 0), snapshot,
        q32Centroids, threshold = 0.32)
      .orderBy(col("vec_id"))
  }

  private val q150Sql = {
    val dists = distsSqlFor(q32Centroids)
    val sim = "round(list_inner_product(t.v, bn.v) / " +
      "(sqrt(list_inner_product(t.v, t.v)) * " +
      "sqrt(list_inner_product(bn.v, bn.v))), 6)"
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |        list_position(dists, list_min(dists)) AS cell
       |      FROM (SELECT vec_id, v, $dists AS dists FROM vecs)),
       |t AS (SELECT * FROM b WHERE vec_id % 20 <> 0),
       |bn AS (SELECT * FROM b
       |       WHERE vec_id % 20 = 0 AND vec_id < $FixedBenchMaxId),
       |hits AS (
       |  SELECT t.vec_id, CAST(t.cell AS BIGINT) AS cell,
       |    bn.vec_id AS bench_id, $sim AS sim
       |  FROM t JOIN bn ON t.cell = bn.cell
       |  WHERE $sim >= 0.32)
       |SELECT vec_id, cell, min(bench_id) AS contaminated_by,
       |  count(*) AS n_hits, max(sim) AS max_sim
       |FROM hits GROUP BY vec_id, cell
       |ORDER BY vec_id""".stripMargin
  }

  // --------------------------------------------------------------- q130
  // Engine-exact distributed power iteration: 3 iterations of v ← A·v /
  // ‖A·v‖ over A = Σ xxᵀ, each iteration one map pass + one exact
  // quantized vector-sum aggregation (the q91 fixed-point recipe applied
  // to a MATVEC — bit-stable across partitionings and engines). The
  // oracle replays all three iterations as chained single-row CTEs: the
  // per-row dot against the previous iterate, the per-dim quantized
  // sums, the left-assoc norm fold, and the element divisions are the
  // same scalar IEEE arithmetic on both sides, so every component and
  // eigenvalue estimate hash-matches to the last bit before rounding.
  private val PiDims = 64
  private val PiIters = 3

  private def q130(s: SparkSession, dir: String): DataFrame = {
    val trace = graft.operators.Vectors.powerIterationTrace(
      Tables.embeddings(s, dir), "embedding", dims = PiDims,
      iters = PiIters)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = trace.zipWithIndex.flatMap { case ((v, lam), i) =>
      v.zipWithIndex.map { case (c, d) =>
        ((i + 1).toLong, (d + 1).toLong, r6(c), r6(lam))
      }
    }
    import s.implicits._
    rows.toDF("iter", "dim", "component", "lambda_est")
      .orderBy(col("iter"), col("dim"))
  }

  private val q130Sql = {
    val dims = PiDims
    val sc = "1048576.0"
    // left-assoc dot of the row vector against iterate components
    def dotOf(comp: Int => String): String =
      (1 to dims).map(d => s"(v[$d]*(${comp(d)}))")
        .mkString("(", " + ", ")")
    def iterCte(k: Int, comp: Int => String): String = {
      val sums = (1 to dims).map(d =>
        s"sum(CAST(round(v[$d] * s * $sc) AS BIGINT)) AS w$d")
        .mkString(",\n      ")
      val normTerms = (1 to dims).map(d =>
        s"CAST(w$d AS DOUBLE)*CAST(w$d AS DOUBLE)")
        .mkString("(0.0 + ", " + ", ")")
      val comps = (1 to dims).map(d =>
        s"CAST(w$d AS DOUBLE)/nrm AS c$d").mkString(", ")
      s"""w$k AS (
         |  SELECT $sums
         |  FROM (SELECT v, ${dotOf(comp)} AS s FROM vecs${
             if (k == 1) "" else s", i${k - 1}"})),
         |n$k AS (SELECT *, sqrt($normTerms) AS nrm FROM w$k),
         |i$k AS (SELECT $comps, nrm / $sc AS lam FROM n$k)""".stripMargin
    }
    val ctes = (1 to PiIters).map { k =>
      iterCte(k, d => if (k == 1) "0.125" else s"i${k - 1}.c$d")
    }.mkString(",\n")
    val unions = (1 to PiIters).map { k =>
      val lst = (1 to dims).map(d => s"c$d").mkString("[", ", ", "]")
      s"SELECT $k AS it, $lst AS comps, lam FROM i$k"
    }.mkString("\n      UNION ALL ")
    s"""WITH vecs AS (
       |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$ctes
       |SELECT CAST(it AS BIGINT) AS iter, CAST(gs.d AS BIGINT) AS dim,
       |  round(comps[gs.d], 6) AS component, round(lam, 6) AS lambda_est
       |FROM ($unions),
       |  generate_series(1, $dims) AS gs(d)
       |ORDER BY iter, dim""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_power_iteration" -> (q130 _),
    "q127_prototype_prune" -> (q127 _),
    "q128_semantic_decontam" -> (q128 _),
    "q150_decontam_fixedbench" -> (q150 _),
    "q30_knn_bruteforce" -> (q30 _),
    "q31_knn_lsh" -> (q31 _),
    "q32_knn_ivf" -> (q32 _),
    "q33_embedding_neardup" -> (q33 _),
    "q149_embed_neardup_routed" -> (q149 _),
    "q91_vec_centroids" -> (q91 _),
    "q92_vec_normalize" -> (q92 _),
    "q97_semantic_dedup" -> (q97 _),
    "q99_ivf_cell_stats" -> (q99 _),
    "q103_semantic_dedup_increment" -> (q103 _),
    "q162_cluster_balance" -> (q162 _),
    "q163_curation_balance" -> (q163 _),
    "q104_knn_ivf_adaptive" -> (q104 _),
    "q105_knn_ivfpq" -> (q105 _))

  val oracleSql: Map[String, String] = Map(
    "q130_power_iteration" -> q130Sql,
    "q127_prototype_prune" -> q127Sql,
    "q128_semantic_decontam" -> q128Sql,
    "q150_decontam_fixedbench" -> q150Sql,
    "q30_knn_bruteforce" -> q30Sql,
    "q31_knn_lsh" -> q31Sql,
    "q32_knn_ivf" -> q32Sql,
    "q33_embedding_neardup" -> q33Sql,
    "q149_embed_neardup_routed" -> q33Sql,
    "q91_vec_centroids" -> q91Sql,
    "q92_vec_normalize" -> q92Sql,
    "q97_semantic_dedup" -> q97Sql,
    "q99_ivf_cell_stats" -> q99Sql,
    "q103_semantic_dedup_increment" -> q103Sql,
    "q162_cluster_balance" -> q162Sql,
    "q163_curation_balance" -> q163Sql,
    "q104_knn_ivf_adaptive" -> q104Sql,
    "q105_knn_ivfpq" -> q105Sql)
}
