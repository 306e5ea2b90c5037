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
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.lshKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      planes = randPlanes(8, 64, seed = 42L))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q32
  private def q32(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfKnn(
      emb.filter(col("vec_id") < NumQueries), emb, K,
      centroids = randPlanes(16, 64, seed = 7L))
      .orderBy(col("query_id"), col("rank"))
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
    "q33_embedding_neardup" -> q33Sql)
}
