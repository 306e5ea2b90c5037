package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.{Curation, Dedup}

/** Corpus-curation operators over `documents`: contamination detection,
  * repetition signals, TF-IDF keywords, incremental dedup, stratified quota
  * sampling, mixture planning/sampling, sequence packing, vocabulary
  * induction, the end-to-end curation funnel, the duplicated-span
  * diagnostic, and exact-substring dedup spans. Every query carries a
  * DuckDB oracle.
  *
  * Benchmark / batch membership is derived from doc_id arithmetic so the
  * partition is deterministic, engine-independent, and scales with the
  * table (no hard-coded id lists).
  */
object CurationQueries {

  private val toksSql = """string_split_regex(trim(text), '\s+')"""

  // ---------------------------------------------------------------- q79
  // Benchmark contamination: corpus docs sharing word-4-grams with the
  // "benchmark" slice (doc_id % 20 == 0). Grams travel as xxhash64 keys in
  // Spark (broadcast probe, no corpus shuffle); the oracle joins the gram
  // strings themselves — identical counts absent 2^-65 hash collisions.
  private def q79(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.contaminationReport(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4, flagThreshold = 0.05)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  private val q79Sql = {
    val sh =
      s"""list_distinct(list_transform(
         |    generate_series(1, greatest(len($toksSql) - 3, 0)),
         |    i -> concat_ws(' ', $toksSql[i], $toksSql[i+1],
         |                   $toksSql[i+2], $toksSql[i+3])))""".stripMargin
    s"""WITH sh AS (
       |  SELECT doc_id, unnest($sh) AS g FROM documents),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 20 = 0),
       |corpus AS (SELECT doc_id, g FROM sh WHERE doc_id % 20 != 0),
       |tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
       |hit AS (SELECT c.doc_id, count(*) AS n_overlap
       |        FROM corpus c JOIN bench b USING (g) GROUP BY 1)
       |SELECT t.doc_id, t.n_shingles, h.n_overlap,
       |  round(CAST(h.n_overlap AS DOUBLE)
       |    / CAST(greatest(t.n_shingles, 1) AS DOUBLE), 6) AS overlap_ratio,
       |  CAST(h.n_overlap AS DOUBLE)
       |    / CAST(greatest(t.n_shingles, 1) AS DOUBLE) >= 0.05
       |    AS contaminated
       |FROM tot t JOIN hit h USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q159
  // Broadcast-Bloom decontamination: q79's contamination check with the
  // gram join replaced by a map-only probe of the benchmark's Bloom bit
  // array (k = 3 md5-60-bit positions per gram, mBits = 2^22). The oracle
  // replays the EXACT filter — false positives included — because a gram
  // hits iff all 3 of its positions are in the distinct set-bit table the
  // benchmark implies, and set-membership is equivalent to the bit test.
  // Spark never explodes or joins the corpus; DuckDB re-derives the same
  // verdicts relationally, so a hash match proves the kernel's md5
  // positions, the bit_or build, and the all-k-bits probe cross-engine.
  private def q159(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.bloomContaminationReport(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4, mBits = 1 << 22, k = 3,
        flagThreshold = 0.05)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  private val q159Sql = {
    val grams =
      s"""list_distinct(list_transform(
         |    generate_series(1, greatest(len($toksSql) - 3, 0)),
         |    i -> concat_ws(' ', $toksSql[i], $toksSql[i+1],
         |                   $toksSql[i+2], $toksSql[i+3])))""".stripMargin
    def pos(g: String) =
      s"""CAST(concat('0x', substr(md5($g || '#' || CAST(i AS VARCHAR)),
         |      1, 15)) AS BIGINT) % 4194304""".stripMargin
    s"""WITH g AS (SELECT doc_id, $grams AS grams FROM documents),
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
       |hits AS (SELECT doc_id, count(*) AS n_bloom_hits FROM hitg
       |         GROUP BY doc_id),
       |tot AS (SELECT doc_id, len(grams) AS n_shingles FROM g
       |        WHERE doc_id % 20 != 0)
       |SELECT t.doc_id, t.n_shingles,
       |  coalesce(h.n_bloom_hits, 0) AS n_bloom_hits,
       |  round(CAST(coalesce(h.n_bloom_hits, 0) AS DOUBLE)
       |    / CAST(greatest(t.n_shingles, 1) AS DOUBLE), 6) AS hit_ratio,
       |  CAST(coalesce(h.n_bloom_hits, 0) AS DOUBLE)
       |    / CAST(greatest(t.n_shingles, 1) AS DOUBLE) >= 0.05
       |    AS contaminated
       |FROM tot t LEFT JOIN hits h USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q80
  // Gopher-style repetition signals as one shuffle-free projection (the
  // Spark side folds each doc's own sorted token array; the oracle
  // re-derives the same numbers relationally via unnest + group-by).
  private def q80(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionSignals(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q80Sql = {
    val bigrams =
      s"""list_transform(generate_series(1, greatest(len($toksSql) - 1, 0)),
         |    i -> concat_ws(' ', $toksSql[i], $toksSql[i+1]))""".stripMargin
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
       |ts AS (SELECT doc_id, sum(cnt) AS n, count(*) AS nd, max(cnt) AS top
       |       FROM c GROUP BY 1),
       |bt AS (SELECT doc_id, unnest($bigrams) AS bg FROM documents),
       |bc AS (SELECT doc_id, bg, count(*) AS cnt FROM bt GROUP BY 1, 2),
       |bs AS (SELECT doc_id, sum(cnt) AS nb, max(cnt) AS topb
       |       FROM bc GROUP BY 1)
       |SELECT ts.doc_id, CAST(ts.n AS BIGINT) AS n_tokens,
       |  round(CAST(nd AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), 6)
       |    AS distinct_ratio,
       |  round(CAST(top AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE), 6)
       |    AS top_token_frac,
       |  round(CAST(coalesce(topb, 0) AS DOUBLE)
       |    / CAST(greatest(coalesce(nb, 1), 1) AS DOUBLE), 6)
       |    AS top_bigram_frac,
       |  (CAST(nd AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE) < 0.35
       |    OR CAST(top AS DOUBLE) / CAST(greatest(n, 1) AS DOUBLE) > 0.13)
       |    AS repetitive
       |FROM ts LEFT JOIN bs USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q81
  // Top TF-IDF term per document (smooth idf, deterministic tie-break).
  private def q81(s: SparkSession, dir: String): DataFrame =
    Curation.topTfidfTerm(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q81Sql =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf,
       |    CAST(tf.tf AS DOUBLE) *
       |      (ln((CAST(n_docs AS DOUBLE) + 1) /
       |          (CAST(doc_freq AS DOUBLE) + 1)) + 1) AS score
       |  FROM tf JOIN dft USING (term) CROSS JOIN n),
       |rk AS (SELECT *, row_number() OVER
       |         (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
       |       FROM scored)
       |SELECT doc_id, term AS top_term, tf, round(score, 6) AS tfidf
       |FROM rk WHERE rk = 1
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q82
  // Incremental dedup: the "new batch" (doc_id % 10 < 2) against the
  // already-ingested snapshot (the rest) — anti-join on digests only.
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.incrementalDedup(
        docs.filter(col("doc_id") % 10 < 2),
        docs.filter(col("doc_id") % 10 >= 2),
        "doc_id", "text")
      .orderBy(col("content_hash"))
  }

  private val q82Sql =
    """WITH batch AS (SELECT doc_id, md5(text) AS h FROM documents
      |               WHERE doc_id % 10 < 2),
      |snap AS (SELECT DISTINCT md5(text) AS h FROM documents
      |         WHERE doc_id % 10 >= 2)
      |SELECT h AS content_hash, min(doc_id) AS keep_id,
      |  count(*) AS batch_dups
      |FROM batch WHERE h NOT IN (SELECT h FROM snap)
      |GROUP BY h
      |ORDER BY content_hash""".stripMargin

  // ---------------------------------------------------------------- q83
  // Deterministic stratified quota sample: 20 docs per language, ordered
  // by a content-free md5 of the id (stable across engines and runs).
  private def q83(s: SparkSession, dir: String): DataFrame =
    Curation.quotaSample(Tables.documents(s, dir), "lang", "doc_id", 20)
      .select(col("lang"), col("doc_id"), col("sample_rank"))
      .orderBy(col("lang"), col("sample_rank"))

  private val q83Sql =
    """WITH rk AS (
      |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC)
      |    AS sample_rank
      |  FROM documents)
      |SELECT lang, doc_id, sample_rank FROM rk WHERE sample_rank <= 20
      |ORDER BY lang, sample_rank""".stripMargin

  // ---------------------------------------------------------------- q84
  // Source-mixture plan: per-source token inventory and the downsampling
  // rate that flattens the corpus to uniform source shares.
  private def q84(s: SparkSession, dir: String): DataFrame =
    Curation.mixturePlan(Tables.documents(s, dir), "source",
        TextAnalysis.tokenCount(col("text")))
      .orderBy(col("source"))

  private val q84Sql = {
    val actual = "CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)"
    val target = "1.0 / CAST(n_sources AS DOUBLE)"
    val rate = s"least(1.0, ($target) / ($actual))"
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    sum(len($toksSql)) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS total_tokens,
       |          count(*) AS n_sources FROM per)
       |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round($actual, 6) AS actual_share,
       |  round($target, 6) AS target_share,
       |  round($rate, 6) AS sample_rate,
       |  CAST(floor(CAST(n_tokens AS DOUBLE) * ($rate)) AS BIGINT)
       |    AS expected_tokens
       |FROM per CROSS JOIN tot
       |ORDER BY source""".stripMargin
  }

  // --------------------------------------------------------------- q100
  // Temperature mixture plan (α = 0.5 square-root sampling — the
  // mBERT/XLM-R recipe). sqrt is IEEE-correctly-rounded in both engines
  // (unlike pow), and the Σ p^α normalizer sums ×2^40 fixed-point longs
  // so the window accumulation order cannot perturb the result.
  private def q100(s: SparkSession, dir: String): DataFrame =
    Curation.mixturePlanTemperature(Tables.documents(s, dir), "source",
        TextAnalysis.tokenCount(col("text")), alpha = 0.5)
      .orderBy(col("source"))

  private val q100Sql = {
    val p = "CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)"
    val q = s"(sqrt($p) / denom)"
    val rate = s"least(1.0, $q / ($p))"
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_docs,
       |    sum(len($toksSql)) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS total_tokens FROM per),
       |d AS (
       |  SELECT per.*, total_tokens,
       |    CAST(sum(CAST(round(sqrt($p) * 1099511627776.0) AS BIGINT))
       |        OVER () AS DOUBLE) / 1099511627776.0 AS denom
       |  FROM per CROSS JOIN tot)
       |SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  round($p, 6) AS actual_share,
       |  round($q, 6) AS target_share,
       |  round($rate, 6) AS sample_rate,
       |  CAST(floor(CAST(n_tokens AS DOUBLE) * ($rate)) AS BIGINT)
       |    AS expected_tokens
       |FROM d
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q85
  // Sequence packing: concatenate docs in md5 order within 16 hash
  // groups, split at 512-token context boundaries; each doc reports its
  // starting window + offset. Pure integer arithmetic end to end.
  private def q85(s: SparkSession, dir: String): DataFrame =
    Curation.packSequences(Tables.documents(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")), ctxTokens = 512,
        numGroups = 16)
      .orderBy(col("doc_id"))

  private val q85Sql = {
    val h60 = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), " +
      "1, 15)) AS BIGINT)"
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    $h60 % 16 AS pack_group,
       |    md5(CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, pack_group, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY pack_group
       |      ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      - n_tokens AS s
       |  FROM d)
       |SELECT doc_id, pack_group, n_tokens,
       |  s // 512 AS start_window, s % 512 AS window_offset
       |FROM c
       |ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q132
  // Best-fit-decreasing sequence packing: docs never straddle context
  // boundaries — FFD visit order, best-fit bin choice, 8 independent
  // hash groups. The oracle replays the same sequential fold as a
  // DuckDB recursive CTE over a bin-remainder LIST (one recursion step
  // per doc per group; list_position(min(filter(...))) is exactly the
  // lowest-index-smallest-fit tie-break).
  private def q132(s: SparkSession, dir: String): DataFrame =
    Curation.packBestFit(Tables.documents(s, dir), "doc_id",
        TextAnalysis.tokenCount(col("text")), ctxTokens = 512,
        numGroups = 8)
      .orderBy(col("doc_id"))

  private val q132Sql = {
    val h60 = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), " +
      "1, 15)) AS BIGINT)"
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n,
       |    $h60 % 8 AS grp
       |  FROM documents),
       |o AS (
       |  SELECT *, row_number() OVER (PARTITION BY grp
       |    ORDER BY n DESC, doc_id) AS pos
       |  FROM d),
       |pack AS (
       |  SELECT grp, CAST(0 AS BIGINT) AS step,
       |    CAST([] AS BIGINT[]) AS rems, CAST(NULL AS BIGINT) AS doc_id,
       |    CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS bin_idx
       |  FROM (SELECT DISTINCT grp FROM o)
       |  UNION ALL
       |  SELECT grp, step,
       |    CASE WHEN fit IS NULL THEN list_append(old_rems, 512 - n)
       |         ELSE old_rems[1:fit-1] || [old_rems[fit] - n]
       |              || old_rems[fit+1:len(old_rems)] END AS rems,
       |    doc_id, n,
       |    CASE WHEN fit IS NULL THEN len(old_rems)
       |         ELSE fit - 1 END AS bin_idx
       |  FROM (
       |    SELECT p.grp, p.step + 1 AS step, nx.doc_id, nx.n,
       |      list_position(p.rems,
       |        list_min(list_filter(p.rems, r -> r >= nx.n))) AS fit,
       |      p.rems AS old_rems
       |    FROM pack p JOIN o nx ON nx.grp = p.grp AND nx.pos = p.step + 1
       |  ) t)
       |SELECT doc_id, grp AS pack_group, n AS n_tokens, bin_idx
       |FROM pack WHERE step >= 1
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q86
  // Mixture-weighted sampling: q84's plan executed as a deterministic
  // Bernoulli keep (md5(id)/2^60 < rounded rate) — reproducible corpus
  // freeze; both engines compare the identical doubles.
  private def q86(s: SparkSession, dir: String): DataFrame =
    Curation.mixtureSample(Tables.documents(s, dir), "source", "doc_id",
        TextAnalysis.tokenCount(col("text")))
      .orderBy(col("source"))

  private val q86Sql = {
    val actual = "CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)"
    val target = "1.0 / CAST(n_sources AS DOUBLE)"
    val h60 = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), " +
      "1, 15)) AS BIGINT)"
    s"""WITH per AS (
       |  SELECT source, sum(len($toksSql)) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(n_tokens) AS total_tokens,
       |          count(*) AS n_sources FROM per),
       |rates AS (
       |  SELECT source, round(least(1.0, ($target) / ($actual)), 6)
       |    AS sample_rate
       |  FROM per CROSS JOIN tot),
       |kept AS (
       |  SELECT d.source, r.sample_rate,
       |    CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents d JOIN rates r ON d.source = r.source
       |  WHERE CAST($h60 AS DOUBLE) / 1152921504606846976.0
       |    < r.sample_rate)
       |SELECT source, sample_rate, count(*) AS kept_docs,
       |  CAST(sum(n_toks) AS BIGINT) AS kept_tokens
       |FROM kept
       |GROUP BY source, sample_rate
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  // Vocabulary induction: top-20 tokens by corpus frequency with
  // cumulative coverage (frequency-cutoff tokenizer profile).
  private def q87(s: SparkSession, dir: String): DataFrame =
    Curation.vocabulary(Tables.documents(s, dir), "text", k = 20)
      .orderBy(col("vocab_rank"))

  private val q87Sql =
    s"""WITH t AS (SELECT unnest($toksSql) AS token FROM documents),
       |c AS (SELECT token, count(*) AS occurrences FROM t GROUP BY 1),
       |tot AS (SELECT CAST(sum(occurrences) AS BIGINT) AS total FROM c),
       |top AS (SELECT token, occurrences FROM c
       |        ORDER BY occurrences DESC, token ASC LIMIT 20),
       |r AS (
       |  SELECT token, occurrences,
       |    row_number() OVER (ORDER BY occurrences DESC, token ASC)
       |      AS vocab_rank,
       |    CAST(sum(occurrences) OVER (ORDER BY occurrences DESC, token ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM top)
       |SELECT vocab_rank, token, occurrences,
       |  round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
       |    AS cum_coverage
       |FROM r CROSS JOIN tot
       |ORDER BY vocab_rank""".stripMargin

  // ---------------------------------------------------------------- q88
  // The whole curation pipeline as one funnel: quality → exact dedup →
  // benchmark decontamination → mixture sampling, per-source counts.
  // The oracle rebuilds every stage flag relationally from the same
  // building blocks the standalone queries (q22/q20/q79/q86) pin.
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.curateCorpus(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", "source",
        TextAnalysis.EnglishStopwords, n = 4, flagThreshold = 0.05)
      .orderBy(col("source"))
  }

  private val q88Sql = {
    val stopsIn = TextAnalysis.EnglishStopwords.map(w => s"'$w'")
      .mkString(", ")
    val nToks = s"greatest(len($toksSql), 1)"
    val punct = s"""CAST(length(text) - length(regexp_replace(text,
       '[[:punct:]]', '', 'g')) AS DOUBLE)
       / CAST(greatest(length(text), 1) AS DOUBLE)"""
    val digit = s"""CAST(length(text) - length(regexp_replace(text,
       '[0-9]', '', 'g')) AS DOUBLE)
       / CAST(greatest(length(text), 1) AS DOUBLE)"""
    val stop = s"""CAST(len(list_filter($toksSql,
       x -> x IN ($stopsIn))) AS DOUBLE) / CAST($nToks AS DOUBLE)"""
    val avgLen = s"""CAST(list_sum(list_transform($toksSql,
       x -> length(x))) AS DOUBLE) / CAST($nToks AS DOUBLE)"""
    val qFlag = s"""(len($toksSql) >= 10 AND ($punct) < 0.2
       AND ($digit) < 0.2 AND ($stop) > 0.0 AND ($avgLen) < 12.0)"""
    val sh =
      s"""list_distinct(list_transform(
         |    generate_series(1, greatest(len($toksSql) - 3, 0)),
         |    i -> concat_ws(' ', $toksSql[i], $toksSql[i+1],
         |                   $toksSql[i+2], $toksSql[i+3])))""".stripMargin
    val h60 = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), " +
      "1, 15)) AS BIGINT)"
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source, $qFlag AS q,
       |    CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents WHERE doc_id % 20 != 0),
       |sh AS (
       |  SELECT doc_id, unnest($sh) AS g FROM documents),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 20 = 0),
       |csh AS (SELECT doc_id, g FROM sh WHERE doc_id % 20 != 0),
       |tot AS (SELECT doc_id, count(*) AS n_sh FROM csh GROUP BY 1),
       |hit AS (SELECT c.doc_id, count(*) AS n_hit
       |        FROM csh c JOIN bench b USING (g) GROUP BY 1),
       |dirty AS (
       |  SELECT t.doc_id FROM tot t JOIN hit h USING (doc_id)
       |  WHERE CAST(h.n_hit AS DOUBLE)
       |    / CAST(greatest(t.n_sh, 1) AS DOUBLE) >= 0.05),
       |per AS (SELECT source, sum(n_toks) AS n_tokens
       |        FROM corpus GROUP BY 1),
       |stot AS (SELECT sum(n_tokens) AS total_tokens,
       |           count(*) AS n_sources FROM per),
       |rates AS (
       |  SELECT source, round(least(1.0,
       |    (1.0 / CAST(n_sources AS DOUBLE)) /
       |    (CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE))), 6)
       |    AS sample_rate
       |  FROM per CROSS JOIN stot),
       |flagged AS (
       |  SELECT c.doc_id, c.source, c.n_toks, c.q,
       |    (c.q AND c.doc_id = MIN(CASE WHEN c.q THEN c.doc_id END)
       |      OVER (PARTITION BY md5(c.text))) AS dedup,
       |    (c.doc_id IN (SELECT doc_id FROM dirty)) AS dirty_flag,
       |    CAST($h60 AS DOUBLE) / 1152921504606846976.0 AS u,
       |    r.sample_rate
       |  FROM corpus c JOIN rates r ON c.source = r.source),
       |full_flags AS (
       |  SELECT *, (dedup AND NOT dirty_flag) AS clean,
       |    (dedup AND NOT dirty_flag AND u < sample_rate) AS sampled
       |  FROM flagged)
       |SELECT source, count(*) AS n_input,
       |  count(*) FILTER (WHERE q) AS n_quality,
       |  count(*) FILTER (WHERE dedup) AS n_unique,
       |  count(*) FILTER (WHERE clean) AS n_clean,
       |  count(*) FILTER (WHERE sampled) AS n_sampled,
       |  CAST(coalesce(sum(CASE WHEN sampled THEN n_toks END), 0)
       |    AS BIGINT) AS sampled_tokens
       |FROM full_flags
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q89
  // Duplicated-span diagnostic: fraction of each doc's word-5-gram spans
  // occurring in >= 2 documents. Spark joins hashed spans; the oracle
  // joins the gram strings — identical modulo 2^-65 collisions.
  private def q89(s: SparkSession, dir: String): DataFrame =
    Curation.duplicatedSpanFraction(Tables.documents(s, dir), "doc_id",
        "text", n = 5, flagThreshold = 0.5)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q89Sql = {
    val sh =
      s"""list_distinct(list_transform(
         |    generate_series(1, greatest(len($toksSql) - 4, 0)),
         |    i -> concat_ws(' ', $toksSql[i], $toksSql[i+1], $toksSql[i+2],
         |                   $toksSql[i+3], $toksSql[i+4])))""".stripMargin
    s"""WITH sh AS (SELECT doc_id, unnest($sh) AS g FROM documents),
       |dup AS (SELECT g FROM sh GROUP BY g
       |        HAVING count(DISTINCT doc_id) >= 2),
       |m AS (
       |  SELECT s.doc_id, count(*) AS n_spans,
       |    count(*) FILTER (WHERE d.g IS NOT NULL) AS n_dup_spans
       |  FROM sh s LEFT JOIN dup d ON s.g = d.g
       |  GROUP BY 1)
       |SELECT doc_id, n_spans, n_dup_spans,
       |  round(CAST(n_dup_spans AS DOUBLE)
       |    / CAST(greatest(n_spans, 1) AS DOUBLE), 6) AS dup_fraction,
       |  CAST(n_dup_spans AS DOUBLE)
       |    / CAST(greatest(n_spans, 1) AS DOUBLE) >= 0.5
       |    AS mostly_duplicated
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q90
  // Exact-substring dedup spans: maximal runs of word-5-grams occurring in
  // >= 2 documents, as (doc_id, span_start, span_tokens). Spark covers
  // positions with positional xxhash64 gram hashes (native one-pass
  // kernel); the oracle rebuilds the same spans from the gram strings —
  // identical modulo 2^-65 collisions. Both sides merge runs with the
  // pos - row_number gaps-and-islands grouping.
  private def q90(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpans(Tables.documents(s, dir), "doc_id", "text",
        k = 5, minDocs = 2)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("span_start"))

  private val q90Sql =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
       |  FROM toks WHERE len(t) >= 5),
       |grams AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    concat_ws(' ', t[pos], t[pos+1], t[pos+2], t[pos+3], t[pos+4])
       |      AS gram
       |  FROM g),
       |dup AS (SELECT gram FROM grams GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |runs AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM grams JOIN dup USING (gram))
       |SELECT doc_id, min(pos) AS span_start,
       |  max(pos) - min(pos) + 5 AS span_tokens
       |FROM runs GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin

  // ---------------------------------------------------------------- q94
  // Deterministic WEIGHTED sample: 15 docs per language, inclusion
  // probability proportional to token count (Efraimidis–Spirakis
  // exponential race: smallest -ln(u)/w wins; u from md5(doc_id) — the
  // q86 construction, so the draw replays identically in any engine).
  private def q94(s: SparkSession, dir: String): DataFrame =
    Curation.weightedSample(Tables.documents(s, dir), "lang", "doc_id",
        TextAnalysis.tokenCount(col("text")), k = 15)
      .select(col("lang"), col("doc_id"), col("sample_rank"),
        col("sample_key"))
      .orderBy(col("lang"), col("sample_rank"))

  private val q94Sql =
    s"""WITH keyed AS (
       |  SELECT lang, doc_id,
       |    (-ln(CAST(concat('0x',
       |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       |      / 1152921504606846976.0))
       |      / CAST(len($toksSql) AS DOUBLE) AS k
       |  FROM documents WHERE len($toksSql) > 0),
       |rk AS (
       |  SELECT lang, doc_id, round(k, 6) AS sample_key,
       |    row_number() OVER (PARTITION BY lang ORDER BY k ASC, doc_id ASC)
       |      AS sample_rank
       |  FROM keyed)
       |SELECT lang, doc_id, sample_rank, sample_key
       |FROM rk WHERE sample_rank <= 15
       |ORDER BY lang, sample_rank""".stripMargin

  // ---------------------------------------------------------------- q95
  // Repeated-span REMOVAL (q90's rewrite): drop every token covered by a
  // cross-document word-5-gram, rejoin the survivors. Strings + ints
  // only — engine-exact by construction; the oracle rebuilds the same
  // coverage from gram strings and filters with a 1-based index lambda.
  private def q95(s: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpans(Tables.documents(s, dir), "doc_id", "text",
        k = 5, minDocs = 2)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q95Sql =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
       |  FROM toks WHERE len(t) >= 5),
       |grams AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    concat_ws(' ', t[pos], t[pos+1], t[pos+2], t[pos+3], t[pos+4])
       |      AS gram
       |  FROM g),
       |dup AS (SELECT gram FROM grams GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |cov AS (
       |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 4)) AS ti
       |  FROM grams JOIN dup USING (gram)),
       |covset AS (SELECT doc_id, list(ti) AS cv FROM cov GROUP BY doc_id)
       |SELECT tk.doc_id,
       |  CAST(len(tk.t) AS INTEGER) AS n_tokens_before,
       |  CAST(len(list_filter(tk.t,
       |    (x, i) -> NOT list_contains(coalesce(cs.cv, []), CAST(i AS BIGINT))))
       |    AS INTEGER) AS n_tokens_after,
       |  coalesce(array_to_string(list_filter(tk.t,
       |    (x, i) -> NOT list_contains(coalesce(cs.cv, []), CAST(i AS BIGINT))),
       |    ' '), '') AS clean_text
       |FROM toks tk LEFT JOIN covset cs ON tk.doc_id = cs.doc_id
       |ORDER BY tk.doc_id""".stripMargin

  // ---------------------------------------------------------------- q96
  // Suffix-array-grade span removal (q95 + the two refinements the
  // exact-substring dedup recipe ships): each duplicated 5-gram keeps its
  // FIRST corpus-wide occurrence (min doc_id, then min pos — canonical
  // copy retention), and only maximal non-canonical runs spanning >= 50
  // tokens are removed. The oracle marks canonical occurrences with a
  // row_number over (gram ORDER BY doc_id, pos) — the same lexicographic
  // first that Spark's min(struct(id, pos)) aggregate picks.
  private def q96(s: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpansKeepFirst(Tables.documents(s, dir), "doc_id",
        "text", k = 5, minDocs = 2, minSpanTokens = 50)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q96Sql =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
       |  FROM toks WHERE len(t) >= 5),
       |grams AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    concat_ws(' ', t[pos], t[pos+1], t[pos+2], t[pos+3], t[pos+4])
       |      AS gram
       |  FROM g),
       |dup AS (SELECT gram FROM grams GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |occ AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |  FROM grams JOIN dup USING (gram)),
       |runs AS (
       |  SELECT doc_id, pos,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM occ WHERE rn > 1),
       |spans AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) - min(pos) + 5 AS len
       |  FROM runs GROUP BY doc_id, grp
       |  HAVING max(pos) - min(pos) + 5 >= 50),
       |cov AS (
       |  SELECT DISTINCT doc_id, unnest(generate_series(s, s + len - 1)) AS ti
       |  FROM spans),
       |covset AS (SELECT doc_id, list(ti) AS cv FROM cov GROUP BY doc_id)
       |SELECT tk.doc_id,
       |  CAST(len(tk.t) AS INTEGER) AS n_tokens_before,
       |  CAST(len(tk.t) - coalesce(len(cs.cv), 0) AS INTEGER)
       |    AS n_tokens_after,
       |  coalesce(array_to_string(list_filter(tk.t,
       |    (x, i) -> NOT list_contains(coalesce(cs.cv, []), CAST(i AS BIGINT))),
       |    ' '), '') AS clean_text
       |FROM toks tk LEFT JOIN covset cs ON tk.doc_id = cs.doc_id
       |ORDER BY tk.doc_id""".stripMargin

  // --------------------------------------------------------------- q102
  // q96 with RUN-level canonicality: maximal duplicated-gram runs are
  // removed only on a majority non-canonical vote (ties keep), so
  // overlapping duplicated passages can't clip the canonical copy. The
  // oracle folds the canonicality flag (rn = 1) into the q96 machinery
  // and votes per (doc, run) group.
  private def q102(s: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpansKeepFirst(Tables.documents(s, dir), "doc_id",
        "text", k = 5, minDocs = 2, minSpanTokens = 50, runVote = true)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  private val q102Sql =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
       |g AS (
       |  SELECT doc_id, unnest(generate_series(1, len(t) - 4)) AS pos, t
       |  FROM toks WHERE len(t) >= 5),
       |grams AS (
       |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |    concat_ws(' ', t[pos], t[pos+1], t[pos+2], t[pos+3], t[pos+4])
       |      AS gram
       |  FROM g),
       |dup AS (SELECT gram FROM grams GROUP BY gram
       |        HAVING count(DISTINCT doc_id) >= 2),
       |occ AS (
       |  SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
       |  FROM grams JOIN dup USING (gram)),
       |runs AS (
       |  SELECT doc_id, pos, (rn = 1) AS iscan,
       |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM occ),
       |spans AS (
       |  SELECT doc_id, min(pos) AS s, max(pos) - min(pos) + 5 AS len
       |  FROM runs GROUP BY doc_id, grp
       |  HAVING max(pos) - min(pos) + 5 >= 50
       |     AND 2 * sum(CASE WHEN iscan THEN 1 ELSE 0 END) < count(*)),
       |cov AS (
       |  SELECT DISTINCT doc_id, unnest(generate_series(s, s + len - 1)) AS ti
       |  FROM spans),
       |covset AS (SELECT doc_id, list(ti) AS cv FROM cov GROUP BY doc_id)
       |SELECT tk.doc_id,
       |  CAST(len(tk.t) AS INTEGER) AS n_tokens_before,
       |  CAST(len(tk.t) - coalesce(len(cs.cv), 0) AS INTEGER)
       |    AS n_tokens_after,
       |  coalesce(array_to_string(list_filter(tk.t,
       |    (x, i) -> NOT list_contains(coalesce(cs.cv, []), CAST(i AS BIGINT))),
       |    ' '), '') AS clean_text
       |FROM toks tk LEFT JOIN covset cs ON tk.doc_id = cs.doc_id
       |ORDER BY tk.doc_id""".stripMargin

  // --------------------------------------------------------------- q119
  // Overlapping token-window chunking (window 64, stride 48): chunk i of
  // a doc covers tokens [48i, 48i+64), last chunk reaches the doc's end.
  // The oracle re-derives the chunk count, per-chunk token count, and
  // the md5 of each re-joined chunk text from the same whitespace
  // tokenization both engines share (toksSql).
  private def q119(s: SparkSession, dir: String): DataFrame =
    Curation.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
        window = 64, stride = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val q119Sql =
    s"""WITH d AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |n AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(ceil(greatest(len(toks) - 64, 0) / 48.0) AS BIGINT) + 1
       |      AS n_chunks
       |  FROM d),
       |x AS (
       |  SELECT doc_id, toks, n_tokens,
       |    unnest(generate_series(0, n_chunks - 1)) AS i
       |  FROM n)
       |SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS chunk_idx,
       |  LEAST(64, n_tokens - i * 48) AS chunk_tokens,
       |  md5(array_to_string(
       |    list_slice(toks, i * 48 + 1, i * 48 + 64), ' ')) AS chunk_hash
       |FROM x ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------------------- q124
  // Content-defined chunking: boundary after every token whose md5-60bit
  // hash ≡ 0 mod 8; chunk id = prefix count of boundary flags among
  // PRECEDING tokens. DuckDB restates the flags, the prefix window, and
  // the md5 of every in-order re-joined chunk.
  private def q124(s: SparkSession, dir: String): DataFrame =
    Curation.cdcChunks(Tables.documents(s, dir), "doc_id", "text",
        divisor = 8)
      .orderBy(col("doc_id"), col("chunk_id"))

  private val q124Sql =
    s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |t AS (
       |  SELECT doc_id, i, toks[i] AS token,
       |    (CAST(concat('0x', substr(md5(toks[i]), 1, 15)) AS BIGINT)
       |       % 8 = 0) AS flag
       |  FROM d, UNNEST(generate_series(1, len(toks))) AS u(i)),
       |c AS (
       |  SELECT doc_id, i, token,
       |    COALESCE(SUM(CASE WHEN flag THEN 1 ELSE 0 END) OVER (
       |      PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS chunk_id
       |  FROM t)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  count(*) AS n_tokens,
       |  md5(string_agg(token, ' ' ORDER BY i)) AS chunk_hash
       |FROM c GROUP BY doc_id, chunk_id
       |ORDER BY doc_id, chunk_id""".stripMargin

  // --------------------------------------------------------------- q125
  // Gopher/FineWeb document stop rules (Rae et al. 2021 §A1.1) as one
  // map-only projection: word-count bounds, mean-word-length window,
  // type/token diversity floor, stop-word-fraction floor, per-rule
  // verdicts + composite keep. Bounds are tuned to the synthetic corpus
  // (measured sf0.01 quantiles) so EVERY rule exercises both verdicts —
  // a gate where a rule never fires would pin nothing. All metrics are
  // exact-integer ratios with one division each, so both engines compute
  // the same doubles and the boolean comparisons cannot diverge.
  private def q125(s: SparkSession, dir: String): DataFrame =
    Curation.gopherQualityFilter(Tables.documents(s, dir),
        "doc_id", "text",
        minWords = 20, maxWords = 90,
        minMeanWordLen = 3.9, maxMeanWordLen = 5.1,
        minUniqueFrac = 0.35, minStopwordFrac = 0.02,
        stopwords = Seq("the", "a"))
      .orderBy(col("doc_id"))

  private val q125Sql =
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    len(toks) AS n_words,
       |    CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))
       |      AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE)
       |      AS mwl,
       |    CAST(len(list_distinct(toks)) AS DOUBLE)
       |      / CAST(greatest(len(toks), 1) AS DOUBLE) AS uf,
       |    CAST(len(list_filter(toks, w -> list_contains(['the','a'], w)))
       |      AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE) AS sf
       |  FROM t)
       |SELECT doc_id, CAST(n_words AS INT) AS n_words,
       |  round(mwl, 6) AS mean_word_len,
       |  round(uf, 6) AS unique_frac,
       |  round(sf, 6) AS stopword_frac,
       |  (n_words >= 20 AND n_words <= 90) AS ok_words,
       |  (mwl >= 3.9 AND mwl <= 5.1) AS ok_word_len,
       |  (uf >= 0.35) AS ok_unique,
       |  (sf >= 0.02) AS ok_stopwords,
       |  ((n_words >= 20 AND n_words <= 90) AND (mwl >= 3.9 AND mwl <= 5.1)
       |    AND uf >= 0.35 AND sf >= 0.02) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q139
  // Distributed BPE merge learning (Sennrich ACL'16 §3.2): 6 rounds of
  // argmax-pair merges over the distinct-word table — the one
  // text-pipeline primitive q87's frequency vocabulary is not
  // (merge-based, order-sensitive, inherently iterative). The oracle
  // replays the SAME rounds closed-form: per round, a pair-frequency
  // aggregate, a deterministic argmax (freq DESC, pair byte order), and
  // the greedy left-to-right merge as a list_reduce fold over a
  // chr(31)-joined accumulator (DuckDB's reduce seeds with the first
  // element, matching the Spark fold's non-empty-accumulator init).
  private val BpeRounds = 6

  private def q139(s: SparkSession, dir: String): DataFrame =
    Curation.learnBpeMerges(Tables.documents(s, dir), "text", BpeRounds)
      .orderBy(col("round"))

  /** The shared BPE round chain: w0 (distinct words → char symbol
    * lists, counts) and, per round i, pair frequencies pI, the argmax
    * merge mI, and the post-merge word table wI (word column carried
    * so q140 can join segmentations back to corpus tokens). The greedy
    * fold is a list_reduce over a chr(31)-joined accumulator — reduce
    * seeds with the first element, matching the Spark fold's
    * non-empty-accumulator init. */
  private def bpeChainSql(rounds: Int): String = {
    val sep = "chr(31)"
    def lst(acc: String) = s"string_split($acc, $sep)"
    def fold = // greedy merge of round-r's (l, r) pair over syms
      s"""string_split(list_reduce(syms, (acc, s) ->
         |  CASE WHEN list_extract(${lst("acc")}, -1) = m.l AND s = m.r
         |  THEN array_to_string(list_append(list_slice(${lst("acc")},
         |    1, len(${lst("acc")}) - 1), m.l || m.r), $sep)
         |  ELSE acc || $sep || s END), $sep)""".stripMargin
    def pairCte(i: Int) =
      s"""p$i AS (
         |  SELECT list_extract(syms, i) AS l,
         |    list_extract(syms, i + 1) AS r,
         |    CAST(sum(cnt) AS BIGINT) AS freq
         |  FROM w${i - 1}, unnest(range(1, greatest(len(syms), 1))) AS t(i)
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, freq FROM p$i
         |  ORDER BY freq DESC, l, r LIMIT 1),
         |w$i AS (SELECT word, $fold AS syms, cnt FROM w${i - 1}, m$i m)"""
        .stripMargin
    s"""w0 AS (
       |  SELECT word, list_transform(range(1, length(word) + 1),
       |      i -> substr(word, i, 1)) AS syms,
       |    count(*) AS cnt
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+'))
       |      AS word FROM documents)
       |  WHERE length(word) > 0
       |  GROUP BY word),
       |${(1 to rounds).map(pairCte).mkString(",\n")}""".stripMargin
  }

  private val q139Sql: String = {
    val union = (1 to BpeRounds).map(i =>
      s"SELECT $i AS round, l AS left, r AS right, l || r AS merged, " +
        s"freq FROM m$i").mkString("\nUNION ALL\n")
    s"""WITH ${bpeChainSql(BpeRounds)}
       |$union
       |ORDER BY round""".stripMargin
  }

  // --------------------------------------------------------------- q140
  // BPE encoding: the learned 6-rule chain applied to the corpus in the
  // vocab-lookup shape (fold once over distinct words, join corpus
  // tokens by word) — per-doc subword counts + the order-exact
  // segmentation digest. Oracle: same chain, w6 joined back to
  // positioned tokens, string_agg ORDER BY pos.
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = Curation.learnBpeMerges(docs, "text", BpeRounds)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Curation.applyBpeMerges(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id"))
  }

  private val q140Sql: String =
    s"""WITH ${bpeChainSql(BpeRounds)},
       |tk AS (
       |  SELECT d.doc_id, t.i AS pos, list_extract(d.toks, t.i) AS word
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+')
       |      AS toks FROM documents) d,
       |    unnest(range(1, len(d.toks) + 1)) AS t(i)
       |  WHERE length(list_extract(d.toks, t.i)) > 0),
       |j AS (
       |  SELECT tk.doc_id, tk.pos, w.syms
       |  FROM tk JOIN w$BpeRounds w USING (word)),
       |g AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
       |    md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY pos))
       |      AS subword_hash
       |  FROM j GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(g.n_words, 0) AS n_words,
       |  coalesce(g.n_subwords, 0) AS n_subwords,
       |  coalesce(g.subword_hash, md5('')) AS subword_hash
       |FROM documents d LEFT JOIN g USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q142
  // BATCHED BPE merge learning (learnBpeMerges batch=2): each driver
  // round collects the top-8 candidate pairs once and commits the
  // argmax PLUS the best symbol-disjoint runner-up — the ~m× round-trip
  // reduction for 30k-rule vocabularies, at the documented deviation
  // that rule 2 of a round is ranked on round-START statistics. The
  // oracle replays the same adaptive selection closed-form: per driver
  // round, the top-8 candidate window, the argmax a_i, the first
  // candidate b_i whose {l, r, l||r} avoids {a.l, a.r, a.merged}, and
  // the two-rule greedy fold. Fixture note: the corpus's word-salad
  // vocabulary keeps >= 2 disjoint pairs in every round's window at
  // every sf (checked tri-scale), so each driver round commits exactly
  // 2 rules and the chain is closed-form.
  private val BpeBatchRounds = 2 // driver rounds, 2 rules each

  private def q142(s: SparkSession, dir: String): DataFrame =
    Curation.learnBpeMerges(Tables.documents(s, dir), "text",
        rounds = 2 * BpeBatchRounds, minFreq = 2, batch = 2)
      .orderBy(col("round"))

  private val q142Sql: String = {
    val sep = "chr(31)"
    def lst(acc: String) = s"string_split($acc, $sep)"
    def fold(m: String) = // greedy merge of (m.l, m.r) over syms
      s"""string_split(list_reduce(syms, (acc, s) ->
         |  CASE WHEN list_extract(${lst("acc")}, -1) = $m.l AND s = $m.r
         |  THEN array_to_string(list_append(list_slice(${lst("acc")},
         |    1, len(${lst("acc")}) - 1), $m.l || $m.r), $sep)
         |  ELSE acc || $sep || s END), $sep)""".stripMargin
    def roundCte(i: Int) =
      s"""p$i AS (
         |  SELECT list_extract(syms, i) AS l,
         |    list_extract(syms, i + 1) AS r,
         |    CAST(sum(cnt) AS BIGINT) AS freq
         |  FROM w${i - 1}, unnest(range(1, greatest(len(syms), 1))) AS t(i)
         |  GROUP BY 1, 2),
         |c$i AS (SELECT l, r, freq FROM p$i
         |  ORDER BY freq DESC, l, r LIMIT 8),
         |a$i AS (SELECT l, r, freq FROM c$i
         |  ORDER BY freq DESC, l, r LIMIT 1),
         |b$i AS (
         |  SELECT c.l, c.r, c.freq FROM c$i c, a$i a
         |  WHERE c.freq >= 2
         |    AND c.l NOT IN (a.l, a.r, a.l || a.r)
         |    AND c.r NOT IN (a.l, a.r, a.l || a.r)
         |    AND c.l || c.r NOT IN (a.l, a.r, a.l || a.r)
         |  ORDER BY c.freq DESC, c.l, c.r LIMIT 1),
         |wa$i AS (SELECT word, ${fold("m")} AS syms, cnt
         |  FROM w${i - 1}, a$i m),
         |w$i AS (SELECT word, ${fold("m")} AS syms, cnt
         |  FROM wa$i, b$i m)""".stripMargin
    val w0 =
      s"""w0 AS (
         |  SELECT word, list_transform(range(1, length(word) + 1),
         |      i -> substr(word, i, 1)) AS syms,
         |    count(*) AS cnt
         |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+'))
         |      AS word FROM documents)
         |  WHERE length(word) > 0
         |  GROUP BY word)""".stripMargin
    val union = (1 to BpeBatchRounds).flatMap(i => Seq(
      s"SELECT ${2 * i - 1} AS round, l AS left, r AS right, " +
        s"l || r AS merged, freq FROM a$i",
      s"SELECT ${2 * i} AS round, l AS left, r AS right, " +
        s"l || r AS merged, freq FROM b$i")).mkString("\nUNION ALL\n")
    s"""WITH $w0,
       |${(1 to BpeBatchRounds).map(roundCte).mkString(",\n")}
       |$union
       |ORDER BY round""".stripMargin
  }

  // --------------------------------------------------------------- q141
  // Boilerplate line dedup (C4 §2.2 / RefinedWeb §3.2): documents are
  // line-structured deterministically (8-token lines — the corpus's
  // small vocabulary makes identical lines recur across docs
  // naturally), then every line occurring in ≥ 3 distinct docs drops
  // wholesale; output is per-doc line counts + the md5 digest of the
  // rebuilt text. Both engines build the same lines from the same
  // token slices, so the digest is exact.
  private def q141(s: SparkSession, dir: String): DataFrame = {
    // r16: materialize the token array first — the slice lambda would
    // otherwise re-split the doc once per 8-token line (q160 trap)
    val toks = col("_toks")
    val nLines = ceil(size(toks).cast("double") / 8d).cast("int")
    val lined = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(size(toks) > 0)
      .select(col("doc_id"), array_join(transform(
          sequence(lit(0), nLines - 1),
          i => array_join(slice(toks, i * 8 + 1, lit(8)), " ")),
        "\n").as("text"))
    Curation.lineDedup(lined, "doc_id", "text", minDocs = 3)
      .orderBy(col("doc_id"))
  }

  private val q141Sql =
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents
       |  WHERE len($toksSql) > 0),
       |ld AS (
       |  SELECT doc_id, array_to_string(list_transform(
       |      range(0, CAST(ceil(len(toks) / 8.0) AS INT)),
       |      i -> array_to_string(list_slice(toks, i*8 + 1, i*8 + 8),
       |        ' ')), chr(10)) AS text2
       |  FROM t),
       |ln AS (
       |  SELECT d.doc_id, x.i AS pos, list_extract(d.ls, x.i) AS line
       |  FROM (SELECT doc_id, string_split(text2, chr(10)) AS ls
       |        FROM ld) d,
       |    unnest(range(1, len(d.ls) + 1)) AS x(i)),
       |b AS (
       |  SELECT line FROM ln WHERE length(line) > 0 GROUP BY line
       |  HAVING count(DISTINCT doc_id) >= 3),
       |j AS (
       |  SELECT ln.doc_id, ln.pos, ln.line,
       |    (b.line IS NOT NULL) AS d
       |  FROM ln LEFT JOIN b ON ln.line = b.line)
       |SELECT doc_id, count(*) AS n_lines,
       |  CAST(sum(CASE WHEN d THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
       |    FILTER (WHERE NOT d), '')) AS text_hash
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q153
  // Trained quality-classifier inference: logistic model over the fixed
  // 5-feature token-stat vector (Curation.logisticQuality), weights as
  // deployment config. Oracle replays the dot product + sigmoid
  // closed-form in the SAME left-assoc order (IEEE-scalar parity, the
  // q98/q152 discipline); round(…, 6) absorbs nothing — both engines
  // compute identical doubles.
  private val QcWeights = Seq(0.35, -0.12, -2.0, -1.5, 0.8)
  private val QcBias = -0.5

  private def q153(s: SparkSession, dir: String): DataFrame =
    Curation.logisticQuality(Tables.documents(s, dir), "doc_id", "text",
        QcWeights, QcBias)
      .orderBy(col("doc_id"))

  private val q153Sql: String = {
    val Seq(w1, w2, w3, w4, w5) = QcWeights
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(greatest(len(toks), 1) AS DOUBLE) AS nd,
       |    CAST(greatest(length(text), 1) AS DOUBLE) AS chd,
       |    ln(1.0 + CAST(len(toks) AS DOUBLE)) AS f1,
       |    CAST(list_sum(list_transform(toks, x -> length(x)))
       |      AS DOUBLE) AS sumlen,
       |    CAST(length(text) -
       |      length(regexp_replace(text, '[[:punct:]]', '', 'g'))
       |      AS DOUBLE) AS npunct,
       |    CAST(length(text) -
       |      length(regexp_replace(text, '[0-9]', '', 'g'))
       |      AS DOUBLE) AS ndigit,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) AS ndistinct
       |  FROM t),
       |z AS (
       |  SELECT doc_id, n_tokens,
       |    (((($QcBias + $w1 * f1) + $w2 * (sumlen / nd))
       |      + $w3 * (npunct / chd)) + $w4 * (ndigit / chd))
       |      + $w5 * (ndistinct / nd) AS z
       |  FROM f)
       |SELECT doc_id, n_tokens,
       |  round(1.0 / (1.0 + exp(-z)), 6) AS score,
       |  round(1.0 / (1.0 + exp(-z)), 6) >= 0.5 AS label
       |FROM z ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------------------------- q152
  // Unigram-LM (SentencePiece-style) tokenizer learning — the EM
  // complement of q139's BPE: substring seeding, Viterbi E-step over
  // the distinct-word table (native kernel), add-one-smoothed M-step
  // with (cnt desc, piece asc) top-keepTop pruning, chars always kept.
  // The oracle replays BOTH EM rounds closed-form: a recursive CTE
  // enumerates every vocabulary segmentation of every distinct word
  // (31 words, <= 8 chars at all scales — bounded), picks the Viterbi
  // winner with the kernel's exact tie-break triple (score DESC, piece
  // count ASC, U+001F-joined path ASC — boundary order), and
  // re-estimates. Float parity: both engines fold the same doubles
  // left-associatively and ln the same count ratios (the q98/q130
  // IEEE-scalar discipline).
  private val UniRounds = 2
  private val UniPieceLen = 3
  private val UniKeepTop = 64
  private val UniMinSeed = 2L

  private def q152(s: SparkSession, dir: String): DataFrame =
    Curation.learnUnigramLm(Tables.documents(s, dir), "text",
        rounds = UniRounds, maxPieceLen = UniPieceLen,
        keepTop = UniKeepTop, minSeedFreq = UniMinSeed)
      .orderBy(col("round"), col("piece"))

  // The CTE chain shared VERBATIM by the q152 (learning) and q154
  // (encoding) oracles — both need the seed, both EM rounds, and the
  // round-2 Viterbi winners (b2). A named constant, not string surgery
  // on q152Sql: rewording one oracle must not silently break the other.
  private val q152SqlHead: String = {
    val lens = (1 to UniPieceLen).mkString("[", ", ", "]")
    def segCte(i: Int, model: String) =
      s"""seg$i AS (
         |  SELECT word, cnt, 0 AS pos, CAST('' AS VARCHAR) AS path,
         |    CAST(0.0 AS DOUBLE) AS score, 0 AS np
         |  FROM w0
         |  UNION ALL
         |  SELECT s.word, s.cnt, s.pos + ll.l,
         |    CASE WHEN s.pos = 0 THEN m.piece
         |         ELSE s.path || chr(31) || m.piece END,
         |    s.score + m.logp, s.np + 1
         |  FROM seg$i s
         |  CROSS JOIN unnest($lens) AS ll(l)
         |  JOIN $model m ON m.piece = substr(s.word, s.pos + 1, ll.l)
         |  WHERE s.pos + ll.l <= length(s.word)),
         |b$i AS (
         |  SELECT word, cnt, path FROM (
         |    SELECT word, cnt, path, row_number() OVER (
         |      PARTITION BY word
         |      ORDER BY score DESC, np ASC, path ASC) AS rn
         |    FROM seg$i WHERE pos = length(word)) WHERE rn = 1),
         |c$i AS (
         |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt
         |  FROM b$i, unnest(string_split(path, chr(31))) AS tp(piece)
         |  GROUP BY piece)""".stripMargin
    s"""WITH RECURSIVE
       |w0 AS (
       |  SELECT word, count(*) AS cnt
       |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+'))
       |      AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |sp AS (
       |  SELECT substr(word, ii.i, ll.l) AS piece, sum(cnt) AS freq
       |  FROM w0
       |  CROSS JOIN unnest(range(1, length(word) + 1)) AS ii(i)
       |  CROSS JOIN unnest($lens) AS ll(l)
       |  WHERE ii.i + ll.l - 1 <= length(word)
       |  GROUP BY 1),
       |sk AS (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq,
       |      row_number() OVER (ORDER BY freq DESC, piece) AS rn
       |    FROM sp WHERE freq >= $UniMinSeed OR length(piece) = 1)
       |  WHERE rn <= $UniKeepTop OR length(piece) = 1),
       |m0 AS (
       |  SELECT piece, ln(CAST(freq AS DOUBLE) /
       |    (SELECT CAST(sum(freq) AS DOUBLE) FROM sk)) AS logp FROM sk),
       |${segCte(1, "m0")},
       |ch AS (SELECT piece FROM sk WHERE length(piece) = 1),
       |c1s AS (
       |  SELECT piece,
       |    cnt + CASE WHEN length(piece) = 1 THEN 1 ELSE 0 END AS w
       |  FROM c1
       |  UNION ALL
       |  SELECT piece, 1 FROM ch
       |  WHERE piece NOT IN (SELECT piece FROM c1)),
       |k1 AS (
       |  SELECT piece, w FROM (
       |    SELECT piece, w,
       |      row_number() OVER (ORDER BY w DESC, piece) AS rn FROM c1s)
       |  WHERE rn <= $UniKeepTop OR length(piece) = 1),
       |m1 AS (
       |  SELECT piece, ln(CAST(w AS DOUBLE) /
       |    (SELECT CAST(sum(w) AS DOUBLE) FROM k1)) AS logp FROM k1),
       |${segCte(2, "m1")}""".stripMargin
  }

  private val q152Sql: String =
    s"""$q152SqlHead
       |SELECT 1 AS round, piece, cnt FROM c1
       |UNION ALL
       |SELECT 2 AS round, piece, cnt FROM c2
       |ORDER BY round, piece""".stripMargin

  // --------------------------------------------------------------- q154
  // Unigram-LM ENCODING (q140's shape for the SentencePiece family):
  // train with q152's exact configuration, encode the corpus under the
  // final model (the one the last E-step segmented with), so encode
  // segmentations == the last round's Viterbi paths. The oracle reuses
  // the q152 CTE chain through b2 (the round-2 winners) and joins the
  // paths back to positioned corpus tokens, q140Sql-style.
  private def q154(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val (_, model) = Curation.learnUnigramLmBuild(docs, "text",
      rounds = UniRounds, maxPieceLen = UniPieceLen,
      keepTop = UniKeepTop, minSeedFreq = UniMinSeed)
    Curation.applyUnigramLm(docs, "doc_id", "text", model, UniPieceLen)
      .orderBy(col("doc_id"))
  }

  private val q154Sql: String = {
    s"""$q152SqlHead,
       |tk AS (
       |  SELECT d.doc_id, t.i AS pos, list_extract(d.toks, t.i) AS word
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+')
       |      AS toks FROM documents) d,
       |    unnest(range(1, len(d.toks) + 1)) AS t(i)
       |  WHERE length(list_extract(d.toks, t.i)) > 0),
       |jn AS (
       |  SELECT tk.doc_id, tk.pos,
       |    string_split(b2.path, chr(31)) AS syms
       |  FROM tk JOIN b2 USING (word)),
       |g AS (
       |  SELECT doc_id, count(*) AS n_words,
       |    CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
       |    md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY pos))
       |      AS subword_hash
       |  FROM jn GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(g.n_words, 0) AS n_words,
       |  coalesce(g.n_subwords, 0) AS n_subwords,
       |  coalesce(g.subword_hash, md5('')) AS subword_hash
       |FROM documents d LEFT JOIN g USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q152_unigram_lm" -> (q152 _),
    "q154_unigram_encode" -> (q154 _),
    "q153_quality_classifier" -> (q153 _),
    "q139_bpe_merges" -> (q139 _),
    "q140_bpe_encode" -> (q140 _),
    "q142_bpe_batched" -> (q142 _),
    "q141_line_dedup" -> (q141 _),
    "q125_gopher_rules" -> (q125 _),
    "q124_cdc_chunks" -> (q124 _),
    "q119_doc_chunking" -> (q119 _),
    "q102_span_removal_runvote" -> (q102 _),
    "q79_contamination" -> (q79 _),
    "q159_bloom_decontam" -> (q159 _),
    "q80_repetition" -> (q80 _),
    "q81_tfidf" -> (q81 _),
    "q82_incremental_dedup" -> (q82 _),
    "q83_quota_sample" -> (q83 _),
    "q84_mixture_plan" -> (q84 _),
    "q100_mixture_temperature" -> (q100 _),
    "q85_sequence_pack" -> (q85 _),
    "q132_bestfit_pack" -> (q132 _),
    "q86_mixture_sample" -> (q86 _),
    "q87_vocabulary" -> (q87 _),
    "q88_curate_corpus" -> (q88 _),
    "q89_dup_spans" -> (q89 _),
    "q90_repeated_spans" -> (q90 _),
    "q94_weighted_sample" -> (q94 _),
    "q95_span_removal" -> (q95 _),
    "q96_span_removal_keepfirst" -> (q96 _))

  val oracleSql: Map[String, String] = Map(
    "q152_unigram_lm" -> q152Sql,
    "q154_unigram_encode" -> q154Sql,
    "q153_quality_classifier" -> q153Sql,
    "q139_bpe_merges" -> q139Sql,
    "q140_bpe_encode" -> q140Sql,
    "q142_bpe_batched" -> q142Sql,
    "q141_line_dedup" -> q141Sql,
    "q125_gopher_rules" -> q125Sql,
    "q124_cdc_chunks" -> q124Sql,
    "q119_doc_chunking" -> q119Sql,
    "q79_contamination" -> q79Sql,
    "q159_bloom_decontam" -> q159Sql,
    "q80_repetition" -> q80Sql,
    "q81_tfidf" -> q81Sql,
    "q82_incremental_dedup" -> q82Sql,
    "q83_quota_sample" -> q83Sql,
    "q84_mixture_plan" -> q84Sql,
    "q100_mixture_temperature" -> q100Sql,
    "q85_sequence_pack" -> q85Sql,
    "q132_bestfit_pack" -> q132Sql,
    "q86_mixture_sample" -> q86Sql,
    "q87_vocabulary" -> q87Sql,
    "q88_curate_corpus" -> q88Sql,
    "q89_dup_spans" -> q89Sql,
    "q90_repeated_spans" -> q90Sql,
    "q94_weighted_sample" -> q94Sql,
    "q95_span_removal" -> q95Sql,
    "q96_span_removal_keepfirst" -> q96Sql,
    "q102_span_removal_runvote" -> q102Sql)
}
