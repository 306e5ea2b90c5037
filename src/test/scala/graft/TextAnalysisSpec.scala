package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.queries.TextQueries

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and bpe-ish") {
    val df = Seq("hello world, it's 42 degrees!").toDF("t")
    val (ws, bp) = df.select(
      TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeishTokenCount(col("t"))).as[(Int, Int)].head()
    assert(ws == 5)
    // hello | world | , | it | ' | s | 42 | degrees | !
    assert(bp == 9)
  }

  test("punct and digit ratios") {
    val df = Seq("ab,.12").toDF("t")
    val (p, d) = df.select(
      TextAnalysis.punctRatio(col("t")),
      TextAnalysis.digitRatio(col("t"))).as[(Double, Double)].head()
    assert(math.abs(p - 2.0 / 6) < 1e-12)
    assert(math.abs(d - 2.0 / 6) < 1e-12)
  }

  test("stopword ratio counts exact token hits") {
    val df = Seq("the cat and the hat").toDF("t")
    val r = df.select(TextAnalysis.stopwordRatio(col("t"),
      TextAnalysis.EnglishStopwords)).as[Double].head()
    assert(math.abs(r - 3.0 / 5) < 1e-12) // the, and, the
  }

  test("langid votes by stopword profile, earliest argmax on ties") {
    val df = Seq(
      "the cat is on the mat",        // en
      "le chat est dans la maison",   // fr
      "xyzzy plugh nothing matches"   // all-zero → first profile (en)
    ).toDF("t")
    val got = df.select(TextAnalysis.langId(col("t"),
      TextQueries.langProfiles).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "en"))
  }

  test("shingles produce n-grams in order; short docs give empty array") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got.head == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("token-set fingerprint is order-insensitive") {
    val df = Seq(("dog cat bird", "bird dog cat dog")).toDF("a", "b")
    val (fa, fb) = df.select(
      TextAnalysis.tokenSetFingerprint(col("a")),
      TextAnalysis.tokenSetFingerprint(col("b"))).as[(String, String)].head()
    assert(fa == fb)
  }

  test("quality flag rejects punctuation soup and too-short docs") {
    val df = Seq(
      "the quick brown fox jumps over a lazy dog in the warm sun today",
      "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) @@@",
      "too short"
    ).toDF("t")
    val got = df.select(TextAnalysis.qualityOk(col("t"),
      TextAnalysis.EnglishStopwords).as("q")).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false))
  }
}
