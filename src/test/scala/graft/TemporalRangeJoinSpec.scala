package graft

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, Skew, TemporalJoin}

class TemporalRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    // (id, sym, ts)
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 150L), (5L, "C", 50L)
  ).toDF("id", "sym", "ts")

  private lazy val quotes = Seq(
    // (sym, ts, px)
    ("A", 90L, 1.0), ("A", 205L, 2.0), ("A", 290L, 3.0),
    ("B", 200L, 9.0) // only AFTER trade 4
  ).toDF("sym", "ts", "px")

  test("as-of backward picks latest quote at-or-before each trade") {
    val got = TemporalJoin.asOfBackward(trades, quotes, "sym", "ts",
        Seq("px"))
      .select("id", "ts_asof", "px_asof")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      (1L, Some(90L), Some(1.0)),   // strictly before
      (2L, Some(205L), Some(2.0)),  // tie → inclusive
      (3L, Some(290L), Some(3.0)),  // latest of several
      (4L, None, None),             // no quote yet for B
      (5L, None, None)))            // key absent on right
  }

  test("as-of tolerance drops matches older than the window") {
    val got = TemporalJoin.asOfBackward(trades, quotes, "sym", "ts",
        Seq("px"), tolerance = Some(10L))
      .select("id", "px_asof").as[(Long, Option[Double])].collect().toSet
    assert(got == Set(
      (1L, Some(1.0)),  // gap 10 <= tol
      (2L, Some(2.0)),  // gap 0
      (3L, Some(3.0)),  // gap 10
      (4L, None), (5L, None)))
  }

  test("as-of keeps every left row and all left columns") {
    val extra = trades.withColumn("note", concat(lit("n"), col("id")))
    val out = TemporalJoin.asOfBackward(extra, quotes, "sym", "ts", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSet ==
      Set("sym", "ts", "id", "note", "ts_asof", "px_asof"))
    assert(out.filter(col("id") === 3 && col("note") === "n3").count() == 1)
  }

  test("bucketed range join equals the naive non-equi join") {
    val points = spark.range(0, 500).select(
      col("id"), (col("id") % 97 * 3.7).as("v"))
    val intervals = Seq(
      (10L, 0.0, 50.0), (11L, 45.0, 46.0), (12L, 300.0, 360.0),
      (13L, 0.0, 400.0), (14L, 80.0, 80.0) // empty interval
    ).toDF("iv_id", "lo", "hi")
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    val bucketed = RangeJoin.pointInInterval(points, "v", intervals,
        "lo", "hi", bucketWidth = 25.0)
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && naive.nonEmpty)
    // interval spanning many buckets joins each point exactly once
    val wide = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
        bucketWidth = 5.0)
      .filter(col("iv_id") === 13).count()
    assert(wide == naive.count(_._2 == 13L))
  }

  test("salted join equals the plain join") {
    val fact = spark.range(0, 1000)
      .select((col("id") % 7).as("k"), col("id").as("v"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (6L, "g"))
      .toDF("k", "label")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 4)
      .select("k", "v", "label").as[(Long, Long, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }
}
