package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Retrieval-style relevance scoring over document corpora — the ranking
  * layer a training-data pipeline uses to select documents relevant to a
  * topic/query mix (quality-weighted sampling, targeted decontamination,
  * eval-set mining).
  *
  * Scale design: the query's term set is a LITERAL (broadcast by
  * construction), so the corpus side filters its own tokens map-side and
  * only (doc, query-term) hits ever aggregate — the shuffle is bounded by
  * |matching docs| × |query terms|, never the corpus token count. Corpus
  * statistics (N, Σ doc-length) ride a one-row broadcast; per-term
  * document frequencies are a |query-terms|-row broadcast.
  *
  * Determinism (oracle parity): tf, df, and doc lengths are exact
  * integers; avgdl divides exact longs; every per-term score is scalar
  * double arithmetic with a fixed expression shape; and the per-doc SUM
  * folds term scores in sorted-term order (a sequential fold — the same
  * order the oracle's `list_inner_product` uses), so no floating-point
  * reduction depends on row order.
  */
object Retrieval {

  /** Okapi BM25 score of every matching document for a bag-of-terms
    * query: Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), with
    * the standard smooth idf ln((N−df+0.5)/(df+0.5)+1). Returns
    * (id, n_terms, bm25) for documents matching ≥1 query term.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = df.select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("id"), size(col("_toks")).as("dl"), col("_toks"))
    // one-row corpus stats; avgdl = exact long sum / exact count
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast("long")).as("sum_dl"))
    // map-side probe of the literal query set; only hits explode
    val qset = array(queryTerms.map(lit): _*)
    val tf = toks.select(col("id"), col("dl"),
        explode(filter(col("_toks"), t => array_contains(qset, t)))
          .as("term"))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("doc_freq"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(
      (col("n_docs").cast("double") - col("doc_freq") + 0.5) /
        (col("doc_freq").cast("double") + 0.5) + 1.0)
    val norm = lit(k1) *
      (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    val scored = tf.join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("_ts", idf * (col("tf").cast("double") * lit(k1 + 1)) /
        (col("tf").cast("double") + norm))
    // per-doc sum as a SORTED sequential fold — term order, not row order
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        aggregate(
          array_sort(collect_list(struct(col("term"), col("_ts")))),
          lit(0.0), (acc, s) => acc + s.getField("_ts")).as("bm25"))
  }
}
