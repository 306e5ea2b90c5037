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
