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
}
