package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.operators.Curation
import graft.plans.{BloomGramPositions, BloomKernel, BloomNgramProbe}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    // doc 20 is the "benchmark" (id % 20 == 0); 1/2 overlap it, 3/4 don't
    (20L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "the quick brown fox jumps over a sleeping cat instead"),
    (2L, "quick brown fox jumps straight over the lazy dog tonight"),
    (3L, "completely unrelated words about spark catalyst planning"),
    (4L, "tiny doc"), // fewer than n=4 tokens -> zero shingles
    (5L, "")
  ).toDF("doc_id", "text")

  private lazy val bench = docs.filter(col("doc_id") % 20 === 0)
  private lazy val corpus = docs.filter(col("doc_id") % 20 =!= 0)

  // ------------------------------------------------- position parity

  test("kernel position equals the Spark md5/conv oracle idiom") {
    val grams = Seq("the quick brown fox", "lazy dog", "über größe 端到端")
    val m = 1 << 22
    for (g <- grams; i <- 0 until 3) {
      val viaSql = spark.range(1).select(
        pmod(conv(substring(md5(
          concat(lit(g), lit("#"), lit(i.toString))), 1, 15), 16, 10)
          .cast("long"), lit(m.toLong)).as("p"))
        .as[Long].head()
      val viaKernel =
        BloomKernel.position(MessageDigest.getInstance("MD5"), g, i, m)
      assert(viaKernel == viaSql,
        s"position mismatch for gram '$g' i=$i: kernel=$viaKernel sql=$viaSql")
    }
  }

  // ------------------------------------------------- build correctness

  test("bloomContaminationBits sets exactly the benchmark grams' bits") {
    val m = 1 << 12
    val bits = Curation.bloomContaminationBits(bench, "text",
      n = 4, mBits = m, k = 3)
    // reference: driver-side recomputation over the benchmark text
    val text = bench.select("text").as[String].head()
    val toks = text.trim.split("\\s+")
    val grams = toks.sliding(4).map(_.mkString(" ")).toSet
    val md = MessageDigest.getInstance("MD5")
    val expected = for (g <- grams; i <- 0 until 3)
      yield BloomKernel.position(md, g, i, m)
    val ref = new Array[Long](m / 64)
    expected.foreach(p => ref((p >>> 6).toInt) |= (1L << (p & 63L).toInt))
    assert(bits.toSeq == ref.toSeq)
  }

  // ------------------------------------------------- probe semantics

  test("report emits every corpus doc; short/empty docs get zero rows") {
    val rep = Curation.bloomContaminationReport(corpus, bench,
      "doc_id", "text", n = 4, mBits = 1 << 22, k = 3,
      flagThreshold = 0.05)
    val byId = rep.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getBoolean(4)))).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(byId(4L) == ((0, 0, false))) // < n tokens
    assert(byId(5L) == ((0, 0, false))) // empty text
    assert(byId(3L)._2 == 0)            // no shared grams, FP-free at 2^22
    assert(byId(1L)._2 > 0 && byId(2L)._2 > 0)
  }

  test("bloom hits equal exact overlaps at unsaturated m (no FP in fixture)") {
    val exact = Curation.contaminationReport(corpus, bench,
        "doc_id", "text", n = 4, flagThreshold = 0.05)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloom = Curation.bloomContaminationReport(corpus, bench,
        "doc_id", "text", n = 4, mBits = 1 << 22, k = 3,
        flagThreshold = 0.05)
      .collect().map(r => r.getLong(0) -> r.getInt(2).toLong).toMap
    for ((id, n) <- exact)
      assert(bloom(id) == n, s"doc $id: bloom=${bloom(id)} exact=$n")
  }

  test("no false negatives at a tiny, collision-heavy m") {
    // m = 64 forces positions to collide: hit counts may EXCEED the true
    // overlaps (false positives), but never undercount them — the
    // superset guarantee under the worst sizing
    val rep = Curation.bloomContaminationReport(corpus, bench,
        "doc_id", "text", n = 4, mBits = 64, k = 3, flagThreshold = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(4)))).toMap
    val exact = Curation.contaminationReport(corpus, bench,
        "doc_id", "text", n = 4, flagThreshold = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(4)))).toMap
    for ((id, (nOverlap, flagged)) <- exact) {
      assert(rep(id)._2 >= nOverlap,
        s"doc $id: bloom hits ${rep(id)._2} < exact overlap $nOverlap")
      if (flagged) assert(rep(id)._3, s"doc $id: exact-flagged, bloom not")
    }
  }

  // ------------------------------------------------- codegen parity

  test("BloomNgramProbe evaluates identically via codegen and kernel") {
    val m = 1 << 14
    val bits = Curation.bloomContaminationBits(bench, "text",
      n = 4, mBits = m, k = 3)
    val viaDf = corpus.select(col("doc_id"), ColumnBridge.column(
        BloomNgramProbe(ColumnBridge.expression(col("text")),
          4, 3, m, bits)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaKernel = corpus.select("doc_id", "text").collect().map { r =>
      val a = BloomKernel.probe(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
        4, 3, m, bits)
      r.getLong(0) -> Seq(a.getInt(0), a.getInt(1))
    }.toMap
    assert(viaDf == viaKernel)
  }

  test("BloomGramPositions emits k positions per distinct gram, in range") {
    val m = 1 << 16
    val pos = bench.select(explode(ColumnBridge.column(
        BloomGramPositions(ColumnBridge.expression(col("text")), 4, 3, m)))
        .as("p"))
      .as[Long].collect()
    val nGrams = bench.select("text").as[String].head()
      .trim.split("\\s+").sliding(4).map(_.mkString(" ")).toSet.size
    assert(pos.length == nGrams * 3)
    assert(pos.forall(p => p >= 0 && p < m))
  }
}
