package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-corpus analysis primitives for training-data pipelines.
  *
  * Everything here is pure Column algebra over `functions._` (split /
  * regexp / higher-order array functions) — codegen-friendly, shuffle-free,
  * and therefore embarrassingly parallel over document partitions at 100 TB.
  * No UDFs: a per-row Scala closure would break whole-stage codegen for the
  * hottest path of a corpus pipeline.
  */
object TextAnalysis {

  /** Unicode NFC normalization (native codegen'd expression). Apply ONCE
    * at ingest so every downstream hash-based operator (exact dedup,
    * shingles, MinHash, SimHash, contamination) sees one byte form per
    * canonically-equal string — mixed NFC/NFD corpora otherwise hash
    * equal-looking text differently and dedup silently weakens.
    */
  def nfcNormalize(text: Column): Column =
    graft.plans.TextExpressions.nfcNormalize(text)

  /** Whitespace tokenization (the baseline tokenizer). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** CJK character classes as a Java regex class body: Han ideographs,
    * kana, hangul — the scripts that carry no whitespace word boundaries.
    * (Equivalent RE2 spelling for DuckDB oracles:
    * `\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}`.)
    */
  private val CjkClass =
    "\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}"

  /** Script-run segmentation for no-whitespace scripts: inserts spaces
    * around every CJK code point, so each ideograph/kana/hangul syllable
    * becomes its own whitespace token while Latin/digit runs keep their
    * word boundaries. Character-level CJK segmentation is the standard
    * dictionary-free fallback (what BPE/unigram tokenizers seed from,
    * and what n-gram dedup degrades to gracefully).
    *
    * This is the COMPOSITION point for CJK corpora: apply once at ingest
    * (like [[nfcNormalize]]) and every whitespace-tokenized operator
    * downstream — shingles/MinHash dedup, gopher rules, CE scoring, BPE
    * pre-tokenization — works unchanged. One map-only codegen'd
    * projection beats threading a tokenizer flag through 20 operators.
    * The reference's own domain is Traditional-Chinese statements
    * (reference etl.py:13-29 column constants); a corpus engine grown
    * from it must not be whitespace-bound.
    */
  def cjkSegment(text: Column): Column =
    regexp_replace(text, s"([$CjkClass])", " $1 ")

  /** [[tokens]] over [[cjkSegment]]-ed text: Latin words by whitespace,
    * CJK one token per code point.
    */
  def tokensCjk(text: Column): Column = tokens(cjkSegment(text))

  /** BPE-ish subword-boundary token count: word runs + single non-word
    * non-space marks, the common pre-tokenization regex.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  def digitRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[0-9]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Fraction of tokens appearing in `stopwords` (exact, case-sensitive). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
      .cast("double") / greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality heuristic: long enough, not punctuation/digit soup,
    * carries some stopword signal (natural-language-ness). Thresholds follow
    * common corpus-filtering recipes (C4/Gopher-style rules).
    */
  def qualityOk(text: Column, stopwords: Seq[String]): Column =
    (tokenCount(text) >= 10) && (punctRatio(text) < lit(0.2)) &&
      (digitRatio(text) < lit(0.2)) &&
      (stopwordRatio(text, stopwords) > lit(0.0)) &&
      (avgTokenLen(text) < lit(12.0))

  /** Language-ID by stopword-profile voting: score = how many tokens hit
    * each language's stopword list; argmax with a fixed tie-break order.
    * An n-gram-free heuristic that stays in pure Column algebra.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    def score(words: Seq[String]): Column = {
      val ws = array(words.map(lit): _*)
      size(filter(toks, t => array_contains(ws, lower(t))))
    }
    val scored = profiles.map { case (lang, words) => (lang, score(words)) }
    // argmax, first-listed language wins ties (deterministic)
    scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestLang), (lang, s)) =>
        (greatest(bestScore, s),
          when(s > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Character n-grams of the lowercased text (code-point `substr`
    * semantics on both engines — surrogate pairs are one symbol), empty
    * below n characters. The feature extractor behind [[langIdNgram]].
    */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n >= 1, got $n")
    val t = lower(text)
    when(char_length(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), char_length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
  }

  /** Dot product of the text's char-n-gram sequence against one
    * language profile: Σ over grams of the profile's INTEGER weight
    * (0 when absent). Integer weights are deliberate — scores are
    * exact longs, so they are fold-order-free and replay bit-identically
    * in any engine (the q153 IEEE-parity discipline without the
    * left-assoc ceremony). The profile compiles to a map LITERAL
    * (constant-folded once, broadcast with the plan — deployment
    * config, the payment-gateway-rules pattern), and the whole score is
    * a codegen'd map-only projection: no shuffle, no UDF, no join.
    */
  def charNgramScore(text: Column, profile: Seq[(String, Int)],
                     n: Int): Column = {
    require(profile.nonEmpty, "profile must be non-empty")
    val m = map(profile.flatMap { case (g, w) =>
      Seq(lit(g), lit(w.toLong)) }: _*)
    aggregate(charNgrams(text, n), lit(0L),
      (acc, g) => acc + coalesce(element_at(m, g), lit(0L)))
  }

  /** Language-ID by character-n-gram profile scoring (Cavnar–Trenkle
    * 1994 shape, fixed hand-weighted profiles instead of learned
    * ranks): score each language's profile dot-product over the text's
    * char n-grams, argmax with earliest-listed tie-break — [[langId]]'s
    * contract with a far stronger signal than stopword voting, and one
    * that works on UNSEGMENTED text (CJK ideograph n-grams score
    * without a tokenizer, so it composes before or after [[cjkSegment]]).
    * Still a pure map-only Column projection.
    */
  def langIdNgram(text: Column,
                  profiles: Seq[(String, Seq[(String, Int)])],
                  n: Int = 2): Column = {
    require(profiles.nonEmpty, "profiles must be non-empty")
    val scored = profiles.map { case (lang, p) =>
      (lang, charNgramScore(text, p, n)) }
    scored.tail.foldLeft((scored.head._2, lit(scored.head._1))) {
      case ((bestScore, bestLang), (lang, s)) =>
        (greatest(bestScore, s),
          when(s > bestScore, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Default char-bigram profiles (lowercase, space-inclusive grams;
    * weights = hand-assigned distinctiveness, higher = stronger
    * evidence). Order = tie-break priority. These are CONFIG, not
    * model: a deployment trains or extends its own table (e.g. a zh/ja
    * profile over its ideograph inventory) and passes it in.
    */
  val NgramProfiles: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq("th" -> 10, "he" -> 6, "of" -> 6, "nd" -> 5, "in" -> 4,
      "er" -> 3, "an" -> 3, "re" -> 3, "on" -> 2, "at" -> 3, "ng" -> 4,
      "is" -> 3, "it" -> 2, "to" -> 3, "nt" -> 2, "ed" -> 3, "ti" -> 2,
      "st" -> 2, "ar" -> 2, "al" -> 2),
    "fr" -> Seq("le" -> 7, "qu" -> 6, "ou" -> 5, "au" -> 5, "de" -> 4,
      "es" -> 3, "la" -> 4, "et" -> 4, "ai" -> 4, "ur" -> 3, "on" -> 3,
      "en" -> 2, "nt" -> 3, "re" -> 2, "il" -> 3, "un" -> 3, "ux" -> 6,
      "eu" -> 4),
    "es" -> Seq("ió" -> 8, "ón" -> 8, "ll" -> 6, "ña" -> 8, "de" -> 4,
      "la" -> 4, "os" -> 5, "el" -> 4, "ue" -> 4, "ci" -> 3, "ad" -> 3,
      "ra" -> 3, "es" -> 3, "en" -> 2, "ar" -> 2, "al" -> 2, "do" -> 3,
      "qu" -> 2),
    "de" -> Seq("ch" -> 8, "sc" -> 6, "ei" -> 6, "ie" -> 4, "en" -> 5,
      "er" -> 4, "un" -> 3, "ge" -> 4, "zu" -> 5, "di" -> 3, "nd" -> 2,
      "de" -> 3, "te" -> 2, "st" -> 2, "au" -> 3, "he" -> 2, "da" -> 2,
      "is" -> 1))
  def tokenSetFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Word n-gram shingles (n >= 1) as an array column, for Jaccard /
    * MinHash dedup. Empty array when the document has fewer than n tokens.
    *
    * PERF: pass a MATERIALIZED token array column ([[shinglesOfTokens]])
    * when possible. Handing `tokens(text)` straight to the transform
    * lambda inlines the split() at every element_at site, so each shingle
    * re-tokenizes the document (~3·|shingles| splits per row — measured
    * 4-6s for 1000 docs before the fix, ~0.3s after).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** [[shingles]] over an existing token-array column (or expression —
    * prefer projecting the tokens into a column first, see above).
    *
    * Built as array_join(slice(...)) rather than
    * concat_ws(element_at...): Spark's ConcatWs codegen miscompiles
    * inside a higher-order-function lambda (the generated call passes
    * `Object[]` where `UTF8String.concatWs` wants `UTF8String[]`),
    * and the whole projection silently falls back to interpreted eval —
    * observed on every span-removal query before the rewrite. The two
    * forms produce identical strings on non-null tokens.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** PII masking patterns, applied in order (emails first so their digit
    * runs can't be half-eaten by the numeric patterns; SSN before card
    * before phone so the more specific shape wins). Lookarounds keep a
    * longer digit run from matching a shorter pattern's prefix.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "(?<![0-9])[0-9]{3}-[0-9]{2}-[0-9]{4}(?![0-9])", "<SSN>"),
    // grouped 4-4-4-4 (space/dash separators — the dominant written form)
    // OR a contiguous 13-16 digit run; grouped must come first in the
    // alternation so "4111 1111 1111 1111" isn't half-eaten as 4 digits
    ("card",
      "(?<![0-9])(?:[0-9]{4}(?:[ -][0-9]{4}){3}|[0-9]{13,16})(?![0-9])",
      "<CARD>"),
    ("phone",
      "(?<![0-9])(\\+?[0-9]{1,2}[ .-])?\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}(?![0-9])",
      "<PHONE>"))

  /** Masks emails / SSNs / card numbers / phone numbers with typed
    * placeholder tags — the pre-training PII-scrub pass. Pure chained
    * `regexp_replace` (codegen'd, shuffle-free); patterns are a standard
    * heuristic scrub, not a compliance guarantee.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Per-category PII hit counts as a struct column (email, ssn, card,
    * phone) — the audit metric alongside [[redactPii]]. Counts are taken
    * on the progressively redacted text so categories never double-count
    * the same span (mirrors the replace order).
    */
  def piiCounts(text: Column): Column = {
    val (_, cols) = PiiPatterns.foldLeft((text, Seq.empty[Column])) {
      case ((t, acc), (name, re, tag)) =>
        val hits = size(regexp_extract_all(t, lit(re), lit(0))).as(name)
        (regexp_replace(t, re, tag), acc :+ hits)
    }
    struct(cols: _*)
  }

  /** English stopwords used by default profiles/tests. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from", "this")
}
