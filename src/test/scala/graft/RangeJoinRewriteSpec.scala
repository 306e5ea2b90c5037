package graft

import org.apache.spark.sql.functions._

import graft.plans.{GraftExtensions, RangeJoinRewrite}

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = spark.range(0, 400)
    .select(col("id"), (col("id") % 89 * 4.3).as("v"))
  private lazy val intervals = Seq(
    (1L, 0.0, 40.0), (2L, 35.0, 36.5), (3L, 200.0, 380.0),
    (4L, 100.0, 100.0)
  ).toDF("iv_id", "lo", "hi")

  private def nonEqui = points.join(intervals,
    col("v") >= col("lo") && col("v") < col("hi"))

  private def withRule[T](width: Double)(f: => T): T = {
    GraftExtensions.register(spark)
    spark.conf.set(RangeJoinRewrite.WidthConf, width.toString)
    try f finally spark.conf.set(RangeJoinRewrite.WidthConf, "0")
  }

  test("rewrite preserves the non-equi join's results exactly") {
    val naive = nonEqui.select("id", "iv_id")
      .as[(Long, Long)].collect().toSet
    val rewritten = withRule(30.0) {
      nonEqui.select("id", "iv_id").as[(Long, Long)].collect().toSet
    }
    assert(rewritten == naive && naive.nonEmpty)
  }

  test("rewrite replaces the nested-loop join with an equi-join") {
    // baseline (rule inert): no bucket machinery in the optimized plan
    GraftExtensions.register(spark)
    assert(!nonEqui.queryExecution.optimizedPlan.toString
      .contains("_graft_bucket"))
    withRule(30.0) {
      val opt = nonEqui.queryExecution.optimizedPlan.toString
      assert(opt.contains("_graft_bucket")) // bucketed equi-join shape
      assert(opt.contains("Generate explode")) // interval expansion
    }
  }

  test("rule is inert without the width conf") {
    GraftExtensions.register(spark)
    // width conf at 0 → untouched plan, and the join still runs correctly
    assert(!nonEqui.queryExecution.optimizedPlan.toString
      .contains("_graft_bucket"))
    assert(nonEqui.count() > 0)
  }

  test("rule leaves equi-joins alone") {
    withRule(30.0) {
      val dim = Seq((0L, "x"), (1L, "y")).toDF("k", "label")
      val j = points.join(dim, col("id") % 2 === col("k"))
      // still one join, no Generate/bucket machinery in the plan
      assert(!j.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
      assert(j.count() == 400)
    }
  }

  test("SQL surface gets the rewrite too") {
    withRule(30.0) {
      points.createOrReplaceTempView("pts")
      intervals.createOrReplaceTempView("ivs")
      val out = spark.sql(
        "SELECT id, iv_id FROM pts JOIN ivs ON v >= lo AND v < hi")
      assert(out.queryExecution.optimizedPlan.toString
        .contains("_graft_bucket"))
      val naive = nonEqui.select("id", "iv_id")
        .as[(Long, Long)].collect().toSet
      assert(out.as[(Long, Long)].collect().toSet == naive)
    }
  }
}
