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
           b: Double = 0.75): DataFrame =
    bm25FromToks(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("_toks")), queryTerms, k1, b)

  /** [[bm25]] over a pre-tokenized (id, _toks) frame — the shared-scan
    * entry hybrid retrieval uses: one tokenize pass (persisted by the
    * caller) feeds every ranker instead of each ranker re-tokenizing
    * the corpus per aggregate subtree (r17).
    */
  private[graft] def bm25FromToks(toks0: DataFrame,
                                  queryTerms: Seq[String],
                                  k1: Double = 1.2,
                                  b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = toks0
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

  /** Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    * 2001) — the language-modeling ranker, the standard second system
    * next to BM25 in hybrid retrieval: score(d) = Σ_t∈q ln((tf_td + μ ·
    * cf_t/|C|) / (dl_d + μ)). Candidate set = documents matching ≥ 1
    * query term (smoothing scores every document, but retrieval only
    * ranks candidates — the map-side-probe shape as [[bm25]]).
    *
    * Determinism: tf/dl/cf/|C| are exact longs; each term score is
    * scalar double arithmetic in one expression shape; the per-doc sum
    * folds in sorted-term order. A candidate's MISSING query terms
    * contribute their smoothing floor ln(μ·cf_t/|C| / (dl+μ)) — folded
    * in the same term order via a per-doc dense term list. Corpus stats
    * ride one broadcast row; the query-term cf table broadcasts
    * (|query| rows).
    */
  def queryLikelihood(df: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String],
                      mu: Double = 300.0): DataFrame =
    queryLikelihoodFromToks(df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("_toks")), queryTerms, mu)

  /** [[queryLikelihood]] over a pre-tokenized (id, _toks) frame (the
    * [[bm25FromToks]] shared-scan rationale). */
  private[graft] def queryLikelihoodFromToks(toks0: DataFrame,
                                             queryTerms: Seq[String],
                                             mu: Double = 300.0)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct.sorted
    val toks = toks0
      .select(col("id"), size(col("_toks")).cast("long").as("dl"),
        col("_toks"))
    val qset = array(terms.map(lit): _*)
    // explode-free per-doc query-term counts; corpus stats (total tokens
    // + per-term corpus frequency) come from ONE bounded aggregation
    val perDoc = toks.select(col("id"), col("dl"), col("_toks"),
      transform(qset, t =>
        size(filter(col("_toks"), x => x === t)).cast("long")).as("_tfv"))
    val aggCols = sum(col("dl")).as("c_total") +: terms.indices.map(i =>
      sum(element_at(col("_tfv"), i + 1)).as(s"cf$i"))
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*).head()
    val cTotal = math.max(stats.getLong(0), 1L).toDouble
    val cfs = terms.indices.map(i => math.max(stats.getLong(i + 1), 0L))
    // candidates: ≥1 query-term occurrence; score folds ALL query terms
    // in sorted order (dense — missing terms take the smoothing floor)
    val scoreCol = {
      val dlMu = col("dl").cast("double") + lit(mu)
      terms.indices.map { i =>
        val tf = element_at(col("_tfv"), i + 1).cast("double")
        log((tf + lit(mu) * lit(cfs(i).toDouble / cTotal)) / dlMu)
      }.reduceLeft(_ + _)
    }
    perDoc
      .filter(aggregate(col("_tfv"), lit(0L), (a, x) => a + x) > 0L)
      .select(col("id"),
        aggregate(col("_tfv"), lit(0L),
          (a, x) => a + when(x > 0L, 1L).otherwise(0L)).as("n_terms"),
        scoreCol.as("ql"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke, Büttcher 2009): fuse any
    * number of (id, rank) lists into RRF(d) = Σ_sys 1/(k + rank_sys(d)),
    * the standard hybrid-retrieval combiner (BM25 × dense, multi-field,
    * multi-query). Rankings are name-keyed; the per-doc sum folds in
    * SORTED SYSTEM-NAME order so the float result is independent of
    * input order and partitioning. Emits (id, n_systems, rrf) — callers
    * rank by (rrf desc, id asc).
    *
    * Scale: each input is already a top-N list (model-scale); the fuse
    * is one bounded-key shuffle over Σ|lists| rows. Never feed it
    * unranked corpora — rank first, fuse ranks.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking system names must be unique")
    val tagged = rankings.map { case (name, r) =>
      r.select(col("id"), lit(name).as("_sys"),
        col("rank").cast("long").as("_rank"))
    }.reduce(_.unionByName(_))
    tagged.groupBy(col("id"))
      .agg(count(lit(1)).as("n_systems"),
        aggregate(
          array_sort(collect_list(struct(col("_sys"), col("_rank")))),
          lit(0.0),
          (acc, s) => acc + lit(1.0) /
            (lit(k.toDouble) + s.getField("_rank").cast("double")))
          .as("rrf"))
  }
}
