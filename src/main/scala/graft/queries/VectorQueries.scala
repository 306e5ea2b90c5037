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
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      centroids = q32Centroids) // nprobe = 1: query cell == corpus argmin
      .orderBy(col("query_id"), col("rank"))
  }

  private val q32Sql = {
    def l2sq(c: Seq[Double]): String =
      c.zipWithIndex.map { case (x, i) =>
        s"(v[${i + 1}]-($x))*(v[${i + 1}]-($x))"
      }.mkString("(", " + ", ")")
    val dists = q32Centroids.map(l2sq).mkString("[", ",", "]")
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_knn_bruteforce" -> (q30 _),
    "q31_knn_lsh" -> (q31 _),
    "q32_knn_ivf" -> (q32 _),
    "q33_embedding_neardup" -> (q33 _))

  val oracleSql: Map[String, String] = Map(
    "q30_knn_bruteforce" -> q30Sql,
    "q31_knn_lsh" -> q31Sql,
    "q32_knn_ivf" -> q32Sql,
    "q33_embedding_neardup" -> q33Sql)
}
