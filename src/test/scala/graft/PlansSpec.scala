package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.plans.GraftExtensions

/** Native-expression SQL surface + skew helpers. */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  vec_l2sq(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS l2,
        |  sorted_intersect_count(array('a','b','c'), array('b','c','d'))
        |    AS ic,
        |  size(minhash(array('x','y'), 8)) AS mh,
        |  sorted_last_leq(array(10L, 20L, 30L), 25L) AS leq,
        |  sorted_last_leq(array(10L, 20L, 30L), 5L) AS leq_none,
        |  size(hashed_word_shingles('a b c d', 3)) AS hws,
        |  size(hashed_word_shingles('a b', 3)) AS hws_short
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(3) == 8)
    assert(r.getInt(4) == 1)
    assert(r.getInt(5) == -1)
    assert(r.getInt(6) == 2)  // "a b c", "b c d"
    assert(r.getInt(7) == 0)  // fewer than n tokens → empty
  }

  test("simhash and positional-shingle SQL functions match the Scala API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  simhash_xx64('a b c') AS sx,
        |  simhash_md5('a b c') AS sm,
        |  positional_word_shingles('a b a b', 2) AS ps
        |""".stripMargin).head()
    val api = Seq(("a b c", "a b a b")).toDF("t1", "t2").select(
      graft.operators.Dedup.simHash64(col("t1")),
      graft.operators.Dedup.simHashMd5(col("t1")),
      graft.plans.SetExpressions.positionalWordShingles(col("t2"), 2))
      .head()
    assert(r.getLong(0) == api.getLong(0))
    assert(r.getLong(1) == api.getLong(1))
    assert(r.getSeq[Long](2) == api.getSeq[Long](2))
    assert(r.getSeq[Long](2).length == 3) // positional: no dedup of "a b"
  }

  test("hashed_word_shingles rejects n < 1 at analysis time") {
    GraftExtensions.register(spark)
    Seq(0, -3).foreach { n =>
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT hashed_word_shingles('a b c', $n)").collect()
      }
      assert(e.getMessage.contains("requires n >= 1"))
    }
  }

  test("native dot equals the higher-order-function formulation") {
    val df = Seq((Seq(1.0, 2.0, 3.5), Seq(0.5, -1.0, 2.0))).toDF("a", "b")
    val hof = df.select(aggregate(zip_with(col("a"), col("b"),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)).as[Double].head()
    val native = df.select(
      graft.functions.VectorFunctions.dot(col("a"), col("b")))
      .as[Double].head()
    assert(native == hof)
  }

  test("native hashed shingles equal the transform/xxhash64 formulation") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",          // exactly n tokens for n=3 → one shingle
      "one two",        // fewer than n → empty
      "",               // blank → [""] → empty
      "  padded   with   runs  of spaces ",
      "dup dup dup dup dup dup"  // repeated shingles → distinct collapses
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(2, 3, 4)) {
      val lambda = docs.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), array_sort(array_distinct(transform(
          TextAnalysis.shinglesOfTokens(col("_toks"), n),
          s => xxhash64(s)))).as("shingles"))
        .orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
      val native = graft.operators.Dedup
        .hashedShingleSets(docs, "doc_id", "text", n)
        .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
      assert(native == lambda, s"n=$n")
    }
  }

  test("rhpPack's sign bits equal rhpBucket's for <= 64 planes, and " +
    "packing is stable across >64-bit widths") {
    import graft.functions.VectorFunctions.rhpBucket
    import graft.plans.RhpExpressions.rhpPack
    val r = new scala.util.Random(42)
    val planes = Seq.fill(70)(Seq.fill(8)(r.nextGaussian()))
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Seq.fill(8)(math.sin(i * 7.3 + 1).toFloat * (i + 1))))
      .toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    // first 64 planes: the packed long must equal the Column-algebra
    // bucket bit-for-bit
    val got = vecs.select(
        rhpPack(col("v"), planes.take(64)).getItem(0).as("packed"),
        rhpBucket(col("v"), planes.take(64)).as("bucket"))
      .as[(Long, Long)].collect()
    got.foreach { case (p, b) => assert(p == b, s"packed $p != bucket $b") }
    // 70 planes span two longs; the second long holds bits 64..69 and
    // its value equals the 6-plane bucket over planes 64..69
    val wide = vecs.select(
        rhpPack(col("v"), planes).getItem(1).as("hi"),
        rhpBucket(col("v"), planes.drop(64)).as("bucket"))
      .as[(Long, Long)].collect()
    wide.foreach { case (h, b) => assert(h == b, s"hi $h != bucket $b") }
  }

  test("rhpBuckets equals the per-table rhpBucket Column form " +
    "bit-for-bit") {
    // the r16 q149 kernel: one pass over all tables must assign the
    // exact bucket the per-plane aggregate(zip_with) trees assigned
    import graft.functions.VectorFunctions.rhpBucket
    import graft.plans.RhpExpressions.rhpBuckets
    val r = new scala.util.Random(7)
    val tables = Seq.fill(11)(Seq.fill(5)(Seq.fill(8)(r.nextGaussian())))
    val vecs = Seq.tabulate(25)(i =>
      (i.toLong, Seq.fill(8)(math.cos(i * 3.1 + 2).toFloat * (i - 12))))
      .toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
    val kernel = vecs.select(col("id"),
        posexplode(rhpBuckets(col("v"), tables)))
      .select(col("id"), col("pos").as("t"), col("col").as("b"))
      .orderBy("id", "t").as[(Long, Int, Long)].collect().toSeq
    val columnForm = vecs.select(col("id"),
        explode(array(tables.zipWithIndex.map { case (planes, t) =>
          struct(lit(t).as("t"), rhpBucket(col("v"), planes).as("b"))
        }: _*)).as("tb"))
      .select(col("id"), col("tb.t").as("t"), col("tb.b").as("b"))
      .orderBy("id", "t").as[(Long, Int, Long)].collect().toSeq
    assert(kernel == columnForm)
  }

  test("salted join matches the plain join on skewed keys") {
    // 90% of left rows share one hot key
    val left = Seq.tabulate(1000)(i =>
      (if (i % 10 == 0) s"k$i" else "HOT", i)).toDF("key", "lv")
    val right = (Seq(("HOT", 1)) ++ Seq.tabulate(100)(i => (s"k${i * 10}", 2)))
      .toDF("key", "rv")
    val plain = left.join(right, "key")
      .select("key", "lv", "rv").as[(String, Int, Int)].collect().toSet
    val salted = Skew.saltedJoin(left, right, "key", salt = 8)
      .select("key", "lv", "rv").as[(String, Int, Int)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "HOT") == 900)
  }
}
