package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.operators.Sketches

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sf)

  test("approx distinct is within 5% of exact") {
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    val approx = li.select(Sketches.approxDistinct(col("l_partkey")))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketches built per shard merge to the global distinct count") {
    val exact = li.select(countDistinct(col("l_partkey"))).head().getLong(0)
    // build one sketch per orderkey shard, persist-shaped, then union —
    // the incremental-corpus-stats idiom: no rescan of the raw data
    val shards = li
      .withColumn("shard", pmod(col("l_orderkey"), lit(7)))
      .groupBy("shard")
      .agg(Sketches.distinctSketch(col("l_partkey")).as("sk"))
    val merged = shards.select(Sketches.mergeDistinct(col("sk")))
      .head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
  }

  test("approx quantiles track the exact percentiles") {
    val exact = li
      .select(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D))"))
      .head().getSeq[Double](0)
    val approx = li
      .select(Sketches.approxQuantiles(col("l_extendedprice"),
        Seq(0.25, 0.5, 0.9)))
      .head().getSeq[Double](0)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / e < 0.02, s"approx=$a exact=$e")
    }
  }

  test("deterministic HLL is partition-order invariant, bit-exactly") {
    // the integer register sum makes the estimate independent of how
    // partial aggregates merge — the property a double sum cannot give
    val vals = spark.range(0, 20000)
      .select(lit("g").as("grp"), concat(lit("v"), col("id")).as("v"))
    def run(parts: Int) = Sketches.deterministicHll(
        vals.repartition(parts), Seq("grp"), "v", p = 8)
      .select("buckets_hit", "s_int", "hll_estimate")
      .head()
    assert(run(1) == run(17))
    assert(run(17) == run(32))
  }

  test("deterministic HLL tracks the exact count in its working regime") {
    // 20k distinct at m=256 is deep in the estimator's asymptotic band:
    // typical error 1/sqrt(m) ~ 6%; assert a generous 3-sigma bound
    val n = 20000
    val vals = spark.range(0, n)
      .select(lit("g").as("grp"), concat(lit("v"), col("id")).as("v"))
    val est = Sketches.deterministicHll(vals, Seq("grp"), "v", p = 8)
      .select("hll_estimate").head().getDouble(0)
    assert(math.abs(est - n) / n < 0.20, s"est=$est n=$n")
  }

  test("deterministic HLL structure bounds hold") {
    val vals = spark.range(0, 500)
      .select((col("id") % 3).cast("string").as("grp"),
        concat(lit("x"), col("id")).as("v"))
    val rows = Sketches.deterministicHll(vals, Seq("grp"), "v", p = 8)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val hit = r.getAs[Long]("buckets_hit")
      val sInt = r.getAs[Long]("s_int")
      assert(hit >= 1 && hit <= 256)
      // every present bucket contributes in [1, 2^52]; absent ones 2^53
      assert(sInt >= hit + (256 - hit) * (1L << 53))
      assert(sInt <= hit * (1L << 52) + (256 - hit) * (1L << 53))
    }
  }

  test("fused HLL+exact equals the two-branch form bit-for-bit") {
    // deterministicHllWithExact (one distinct pass, no join) must emit
    // exactly what countDistinct joined with deterministicHll emits —
    // the r16 q160 rewrite's equivalence proof. The fixture has heavy
    // cross-row duplication (id % 97) and multiple groups, so the
    // dedup-invariance of max(rho) and the per-bucket distinct counting
    // are both load-bearing.
    val vals = spark.range(0, 30000)
      .select((col("id") % 3).cast("string").as("grp"),
        concat(lit("v"), (col("id") % 97)).as("v"))
    val fused = Sketches.deterministicHllWithExact(
        vals, Seq("grp"), "v", p = 8)
      .select("grp", "n_exact", "buckets_hit", "s_int", "hll_estimate")
      .collect().sortBy(_.getString(0))
    val exact = vals.groupBy("grp")
      .agg(countDistinct(col("v")).as("n_exact"))
    val twoBranch = exact
      .join(Sketches.deterministicHll(vals, Seq("grp"), "v", p = 8),
        Seq("grp"))
      .select("grp", "n_exact", "buckets_hit", "s_int", "hll_estimate")
      .collect().sortBy(_.getString(0))
    assert(fused.toSeq == twoBranch.toSeq)
  }

  test("fused HLL+exact skips NULL values exactly like countDistinct") {
    // r17 advice fix: the fused form filters NULLs before the distinct,
    // matching countDistinct semantics — a NULL-bearing input must yield
    // the same rows as the two-branch join, not an extra null bucket
    val vals = spark.range(0, 500)
      .select((col("id") % 2).cast("string").as("grp"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), col("id") % 23)).as("v"))
    val fused = Sketches.deterministicHllWithExact(
        vals, Seq("grp"), "v", p = 8)
      .select("grp", "n_exact", "buckets_hit", "s_int", "hll_estimate")
      .collect().sortBy(_.getString(0))
    val twoBranch = vals.groupBy("grp")
      .agg(countDistinct(col("v")).as("n_exact"))
      .join(Sketches.deterministicHll(
          vals.filter(col("v").isNotNull), Seq("grp"), "v", p = 8),
        Seq("grp"))
      .select("grp", "n_exact", "buckets_hit", "s_int", "hll_estimate")
      .collect().sortBy(_.getString(0))
    assert(fused.toSeq == twoBranch.toSeq)
  }

  test("count-min estimates are upward-biased and eps-bounded") {
    val n = li.count()
    val bytes = li.select(Sketches.countMin(col("l_returnflag"),
      eps = 0.001)).head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val truth = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect()
    truth.foreach { case (flag, cnt) =>
      val est = cms.estimateCount(flag)
      assert(est >= cnt, s"count-min must never undercount: $flag")
      assert(est <= cnt + (0.001 * n).toLong + 1,
        s"$flag est=$est true=$cnt n=$n")
    }
  }
}
