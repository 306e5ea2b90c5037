package graft

import org.apache.spark.sql.functions._

import graft.plans.AggExpressions

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk aggregate == window rank-filter on random data") {
    val df = spark.range(0, 5000).select(
      (col("id") % 7).as("g"),
      (col("id") * 37 % 1001).cast("double").as("score"),
      col("id"))
      .repartition(8) // exercise partial + merge across tasks
    val agg = df.groupBy("g")
      .agg(AggExpressions.topKByScore(col("score"), col("id"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rk"), col("col.id"),
        col("col.score"))
      .as[(Long, Int, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    val win = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("g"), col("rk"), col("id"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agg == win && win.size == 35)
  }

  test("ties break toward the lower id") {
    val df = Seq((1L, 10.0, 5L), (1L, 10.0, 2L), (1L, 10.0, 9L),
      (1L, 3.0, 1L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(AggExpressions.topKByScore(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top")))
      .select(col("col.id")).as[Long].collect().toSeq
    assert(got == Seq(2L, 5L))
  }

  test("groups smaller than k return all rows, ranked") {
    val df = Seq((1L, 2.0, 10L), (1L, 7.0, 11L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(AggExpressions.topKByScore(col("score"), col("id"), 5).as("top"))
      .select(explode(col("top"))).select(col("col.score"), col("col.id"))
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((7.0, 11L), (2.0, 10L)))
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(5.0), Some(1L)), (1L, None, Some(2L)),
      (1L, Some(9.0), None), (1L, Some(4.0), Some(4L)))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(AggExpressions.topKByScore(col("score"), col("id"), 10).as("top"))
      .select(explode(col("top"))).select(col("col.id"))
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 4L))
  }
}
