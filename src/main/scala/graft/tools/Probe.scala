package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    li.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }

    time("countDistinct only") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("d")).count()
    }
    time("countDistinct + approx") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("d"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("e")).count()
    }
    time("percentile only") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5D)").as("p")).count()
    }
    time("percentile + approx") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5D)").as("p"),
          expr("percentile_approx(l_extendedprice, 0.5D, 2000)").as("t"))
        .count()
    }
    time("percentile_approx only") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(l_extendedprice, 0.5D, 2000)").as("t"))
        .count()
    }
    time("percentile_approx acc=100") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(l_extendedprice, 0.5D, 100)").as("t"))
        .count()
    }
    time("q50 full (split-agg form)") {
      graft.queries.WindowSetQueries.queries("q50_sketch_accuracy")(
        spark, dir).count()
    }
    time("q50 full again") {
      graft.queries.WindowSetQueries.queries("q50_sketch_accuracy")(
        spark, dir).count()
    }
    time("one agg all four") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("d"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("e"),
          expr("percentile(l_extendedprice, 0.5D)").as("p"),
          expr("percentile_approx(l_extendedprice, 0.5D, 2000)").as("t"))
        .count()
    }
    spark.stop()
  }
}
