package graft

import org.apache.spark.sql.functions._

import graft.functions.PandasRank.pctRank

/** pandas `rank(pct=True, method='average')` semantics (SURVEY §2.7 W2 —
  * the highest oracle-mismatch-risk operator). Expectations hand-computed
  * the way pandas computes them.
  */
class PandasRankSpec extends SparkSpec {
  import spark.implicits._

  test("ascending pct rank matches pandas average-rank/n on ties") {
    // values: 10, 20, 20, 30  → avg ranks: 1, 2.5, 2.5, 4 → /4
    val df = Seq((1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0)).toDF("id", "v")
    val got = df.withColumn("p", pctRank(col("v"), ascending = true))
      .orderBy("id").select("p").as[Double].collect()
    assert(got.toSeq == Seq(0.25, 0.625, 0.625, 1.0))
  }

  test("descending pct rank reverses order, keeps average ties") {
    // desc: 30→1, 20,20→avg(2,3)=2.5, 10→4
    val df = Seq((1, 10.0), (2, 20.0), (3, 20.0), (4, 30.0)).toDF("id", "v")
    val got = df.withColumn("p", pctRank(col("v"), ascending = false))
      .orderBy("id").select("p").as[Double].collect()
    assert(got.toSeq == Seq(1.0, 0.625, 0.625, 0.25))
  }

  test("all-equal values rank to (n+1)/2/n exactly") {
    val df = Seq.tabulate(5)(i => (i, 7.0)).toDF("id", "v")
    val got = df.withColumn("p", pctRank(col("v")))
      .select("p").as[Double].collect()
    assert(got.forall(_ == 0.6)) // avg rank 3 of 5
  }

  test("partitioned rank is computed within each partition") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0), ("b", 7.0))
      .toDF("g", "v")
    val got = df.withColumn("p",
        pctRank(col("v"), ascending = true, partitionBy = Seq(col("g"))))
      .orderBy("g", "v").select("p").as[Double].collect()
    assert(got.toSeq == Seq(0.5, 1.0, 1.0 / 3, 2.0 / 3, 1.0))
  }

  test("distributed groupBy+join rank is bit-identical to the window form") {
    val df = Seq.tabulate(200)(i => (i, (i * 13 % 37).toDouble))
      .toDF("id", "v")
    for (asc <- Seq(true, false)) {
      val win = df.withColumn("p", pctRank(col("v"), ascending = asc))
        .orderBy("id").select("p").as[Double].collect().toSeq
      val joined = graft.functions.PandasRank
        .pctRankJoined(df, "v", "p", ascending = asc)
        .orderBy("id").select("p").as[Double].collect().toSeq
      assert(win == joined, s"ascending=$asc") // exact, not approximate
    }
  }

  test("range-partitioned prefix-sum rank is bit-identical to the window form") {
    // heavy ties + enough rows that values spread across range partitions
    val df = Seq.tabulate(500)(i => (i, (i * 7 % 23).toDouble)).toDF("id", "v")
    for (asc <- Seq(true, false); parts <- Seq(1, 3, 16)) {
      val win = df.withColumn("p", pctRank(col("v"), ascending = asc))
        .orderBy("id").select("p").as[Double].collect().toSeq
      val scalable = graft.functions.PandasRank
        .pctRankScalable(df, "v", "p", ascending = asc, numPartitions = parts)
        .orderBy("id").select("p").as[Double].collect().toSeq
      assert(win == scalable, s"ascending=$asc parts=$parts")
    }
  }

  test("pctRankScalableAll: both adaptive strategies are bit-identical " +
    "and preserve column order") {
    // multi-column ranks with ties, mixed directions — forced down each
    // side of the auto threshold
    val df = Seq.tabulate(300)(i =>
      (i, (i * 7 % 23).toDouble, (i * 13 % 17).toLong))
      .toDF("id", "a", "b")
    val specs = Seq(("a", "a_rank", true), ("b", "b_rank", false))
    val windowed = graft.functions.PandasRank
      .pctRankScalableAll(df, specs, autoThreshold = Long.MaxValue)
    val scalable = graft.functions.PandasRank
      .pctRankScalableAll(df, specs, autoThreshold = 0L)
    assert(windowed.columns.toSeq == Seq("id", "a", "b", "a_rank", "b_rank"))
    assert(scalable.columns.toSeq == windowed.columns.toSeq)
    val w = windowed.orderBy("id").collect().map(_.toSeq).toSeq
    val s = scalable.orderBy("id").collect().map(_.toSeq).toSeq
    assert(w == s) // exact, not approximate
  }

  test("null values rank to null, are excluded from n, and never drop rows " +
    "— identically across all three strategies") {
    // pandas: NaN → rank NaN, n counts non-NaN only. 10,20,20,null,30 →
    // non-null avg ranks 1, 2.5, 2.5, 4 over n=4.
    val df = Seq((1, Some(10.0)), (2, Some(20.0)), (3, Some(20.0)),
      (4, Option.empty[Double]), (5, Some(30.0))).toDF("id", "v")
    val expected = Seq(Some(0.25), Some(0.625), Some(0.625), None, Some(1.0))
    def run(d: org.apache.spark.sql.DataFrame): Seq[Option[Double]] =
      d.orderBy("id").select("p").as[Option[Double]].collect().toSeq
    val win = run(df.withColumn("p", pctRank(col("v"))))
    val joined = run(graft.functions.PandasRank.pctRankJoined(df, "v", "p"))
    val scalable = run(graft.functions.PandasRank
      .pctRankScalable(df, "v", "p", numPartitions = 3))
    assert(win == expected)
    assert(joined == expected)
    assert(scalable == expected)
    // and through the adaptive entry point, both sides of the threshold
    for (thr <- Seq(0L, Long.MaxValue)) {
      val all = graft.functions.PandasRank
        .pctRankScalableAll(df, Seq(("v", "p", true)), autoThreshold = thr)
      assert(run(all) == expected, s"autoThreshold=$thr")
      assert(all.count() == 5, s"autoThreshold=$thr must not drop null rows")
    }
  }

  test("results lie in (0, 1] and are monotone in the input") {
    val df = Seq.tabulate(100)(i => (i, (i * 37 % 50).toDouble))
      .toDF("id", "v")
    val got = df.withColumn("p", pctRank(col("v")))
      .orderBy("v", "id").select("p").as[Double].collect()
    assert(got.forall(p => p > 0.0 && p <= 1.0))
    assert(got.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("groupedNtileScalable matches the window ntile bucket-for-bucket") {
    // 3 groups of deliberately unequal sizes (one not divisible by k, one
    // smaller than k) over a unique composite order key
    val df = (Seq.tabulate(1003)(i => ("a", (i * 131) % 1009, i)) ++
        Seq.tabulate(258)(i => ("b", (i * 67) % 271, i)) ++
        Seq.tabulate(3)(i => ("c", i, i)))
      .toDF("g", "v", "id")
      .repartition(7)
    for (k <- Seq(1, 4, 5)) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v"), col("id"))
      val expected = df.withColumn("q", ntile(k).over(w))
        .select("g", "v", "id", "q").as[(String, Int, Int, Int)]
        .collect().toSet
      val got = graft.functions.PandasRank
        .groupedNtileScalable(df, Seq("g"), Seq("v", "id"), k, "q")
        .select("g", "v", "id", "q").as[(String, Int, Int, Int)]
        .collect().toSet
      assert(got == expected, s"k=$k")
    }
  }

  test("Histograms.equiDepth: both exact arms agree row-for-row; the " +
    "sketch arm holds depths within tolerance and a monotone bucket grid") {
    val df = (Seq.tabulate(1003)(i => ("a", (i * 131) % 1009, i)) ++
        Seq.tabulate(258)(i => ("b", (i * 67) % 271, i)))
      .toDF("g", "v", "id").repartition(7)
    def run(windowMax: Long, exactMax: Long) =
      graft.operators.Histograms.equiDepth(df, Seq("g"), "v", Seq("id"),
        k = 4, windowMaxRows = windowMax, exactMaxRows = exactMax)
        .orderBy("g", "bucket")
        .select("g", "bucket", "n", "lo", "hi")
        .as[(String, Int, Long, Int, Int)].collect().toSeq
    val windowArm = run(1L << 20, 1L << 26)
    val scalableArm = run(1L, 1L << 26)
    assert(windowArm == scalableArm,
      "exact arms must produce identical histograms")
    val sketchArm = run(1L, 2L)
    assert(sketchArm.map(r => (r._1, r._2)) ==
      windowArm.map(r => (r._1, r._2)), "bucket grid must match")
    // sketch depths: within 5% of the group total per bucket (exact GK
    // at this size, but boundary ties may shift a few rows)
    for (((g, b, n, lo, hi), i) <- sketchArm.zipWithIndex) {
      val total = sketchArm.filter(_._1 == g).map(_._3).sum
      assert(math.abs(n.toDouble / total - 0.25) <= 0.05,
        s"bucket ($g, $b) depth $n of $total")
      assert(lo <= hi)
      if (i > 0 && sketchArm(i - 1)._1 == g)
        assert(sketchArm(i - 1)._5 <= lo,
          s"bucket grid not monotone at ($g, $b)")
    }
  }
}
