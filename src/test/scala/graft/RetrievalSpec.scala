package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark spark spark runs fast on big data"),
    (2L, "spark appears once in this one document here"),
    (3L, "vector search is a rare topic in this corpus"),
    (4L, "nothing relevant about anything in here at all"),
    (5L, "plain filler words padding the corpus statistics")
  ).toDF("doc_id", "text")

  test("bm25 rewards term frequency with saturation and rarity") {
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("spark", "vector"))
      .select("id", "n_terms", "bm25")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // non-matching docs produce no rows
    assert(got.keySet == Set(1L, 2L, 3L))
    // tf=3 beats tf=1 for the same term, but sublinearly (saturation)
    assert(got(1L)._3 > got(2L)._3)
    assert(got(1L)._3 < 3 * got(2L)._3)
    // "vector" (df=1) is rarer than "spark" (df=2) → higher idf at tf=1
    assert(got(3L)._3 > got(2L)._3)
    assert(got.values.forall(_._2 == 1L)) // each doc matched one term
  }

  test("bm25 is invariant to input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25(df, "doc_id", "text", Seq("spark", "vector", "corpus"))
        .orderBy("id").select("id", "bm25")
        .as[(Long, Double)].collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }

  test("queryLikelihood equals the brute-force Dirichlet LM score and " +
    "only ranks candidates") {
    val mu = 300.0
    val terms = Seq("spark", "vector")
    val got = Retrieval.queryLikelihood(docs, "doc_id", "text", terms, mu)
      .select("id", "n_terms", "ql")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // candidates only
    // brute force, driver-side
    val toks = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val cTotal = toks.values.map(_.size).sum.toDouble
    val sorted = terms.distinct.sorted
    def score(id: Long): Double = {
      val ts = toks(id)
      sorted.map { t =>
        val tf = ts.count(_ == t).toDouble
        val cf = toks.values.map(_.count(_ == t)).sum.toDouble
        math.log((tf + mu * (cf / cTotal)) / (ts.size + mu))
      }.reduceLeft(_ + _)
    }
    got.keys.foreach { id =>
      assert(math.abs(got(id)._3 - score(id)) < 1e-12,
        s"doc $id: ${got(id)._3} != ${score(id)}")
    }
    // the doc with more query-term mass scores higher
    assert(got(1L)._3 > got(2L)._3)
    // invariant to partitioning
    val re = Retrieval.queryLikelihood(docs.repartition(7), "doc_id",
        "text", terms, mu)
      .select("id", "ql").as[(Long, Double)].collect().toMap
    got.keys.foreach(id => assert(re(id) == got(id)._3))
  }

  test("rrfFuse sums 1/(k+rank) over systems in name order and is " +
    "input-order independent") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rank")
    def run(rs: Seq[(String, org.apache.spark.sql.DataFrame)]) =
      Retrieval.rrfFuse(rs, k = 60)
        .select("id", "n_systems", "rrf")
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val got = run(Seq("a" -> a, "b" -> b))
    assert(got(1L) == ((1L, 1L, 1.0 / 61)))
    assert(got(4L) == ((4L, 1L, 1.0 / 63)))
    assert(got(2L)._2 == 2L &&
      got(2L)._3 == 1.0 / 62 + 1.0 / 61) // a-term first (name order)
    assert(got(3L)._3 == 1.0 / 63 + 1.0 / 62)
    // reversing the input list changes nothing (sorted-name fold)
    assert(run(Seq("b" -> b, "a" -> a)) == got)
    // duplicate system names refuse
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("a" -> a, "a" -> b))
    }
  }
}
