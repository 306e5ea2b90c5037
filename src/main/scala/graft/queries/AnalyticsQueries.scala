package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.dsum

/** Standard OLAP shapes rounding out the §2 surface: per-group top-k,
  * hierarchical rollup, pivot, and semi/anti joins — each in the plan
  * shape that scales (WindowGroupLimit pushdown, partial aggs, hash
  * semi/anti joins) and each DuckDB-oracled.
  */
object AnalyticsQueries {

  private def sqlDsum(e: String) =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  // ---------------------------------------------------------------- q38
  // Per-group top-k. The rank-filter pattern Spark plans with
  // WindowGroupLimit: each map task keeps only k rows per group BEFORE
  // the shuffle, so the exchange carries ~k·|groups| rows, not the table.
  private def q38(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  private val q38Sql =
    """SELECT o_orderpriority, rk, o_orderkey, o_totalprice
      |FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders)
      |WHERE rk <= 3
      |ORDER BY o_orderpriority, rk""".stripMargin

  // ---------------------------------------------------------------- q39
  // Hierarchical rollup: (status, priority), (status), () subtotals in
  // one pass — Spark expands grouping sets into one shuffle with partial
  // aggs. Subtotal NULLs are coalesced to 'ALL' sentinels (the grouped
  // columns are never null in the data) to keep the compare NULL-free.
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  private val q39Sql =
    s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       |  COALESCE(o_orderpriority, 'ALL') AS priority,
       |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
       |ORDER BY status, priority""".stripMargin

  // ---------------------------------------------------------------- q40
  // Pivot (long → wide), the value_counts/crosstab shape: one partial-agg
  // shuffle keyed on user_id; explicit pivot values keep the schema
  // static (no driver-side distinct pass — required at scale).
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")
  private def q40(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(dsum(col("value")))
      .na.fill(0.0, eventTypes)
      .orderBy(col("user_id"))

  private val q40Sql = {
    val cols = eventTypes.map { t =>
      s"""  COALESCE(${sqlDsum(s"CASE WHEN event_type = '$t' THEN value END")},
         |    0.0) AS "$t"""".stripMargin
    }.mkString(",\n")
    s"""SELECT user_id,
       |$cols
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  // ---------------------------------------------------------------- q41
  // Semi + anti join in one report: per market segment, customers with
  // and without orders. Both plan as hash semi/anti joins (shuffle or
  // broadcast by side size) — never a materialized subquery result.
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy(col("c_mktsegment"))
  }

  private val q41Sql =
    """WITH w AS (
      |  SELECT c_mktsegment, COUNT(*) AS n_with_orders
      |  FROM customer
      |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment),
      |wo AS (
      |  SELECT c_mktsegment, COUNT(*) AS n_without_orders
      |  FROM customer
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY c_mktsegment)
      |SELECT c_mktsegment,
      |  COALESCE(n_with_orders, 0) AS n_with_orders,
      |  COALESCE(n_without_orders, 0) AS n_without_orders
      |FROM w FULL OUTER JOIN wo USING (c_mktsegment)
      |ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q42
  // Same top-3-per-group as q38, via the native bounded-heap AGGREGATE
  // (graft.plans.TopKByScore) instead of the window rank-filter: one hash
  // aggregation with O(k) partial state per group and no sort anywhere.
  // Oracle-checked against the identical SQL as q38 — two different plans
  // must produce byte-identical results.
  private def q42(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.plans.AggExpressions.topKByScore(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).as("rk"),
        col("col.id").as("o_orderkey"), col("col.score").as("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_topk_per_group" -> (q38 _),
    "q39_rollup" -> (q39 _),
    "q40_pivot" -> (q40 _),
    "q41_semi_anti_join" -> (q41 _),
    "q42_topk_agg" -> (q42 _))

  val oracleSql: Map[String, String] = Map(
    "q38_topk_per_group" -> q38Sql,
    "q39_rollup" -> q39Sql,
    "q40_pivot" -> q40Sql,
    "q41_semi_anti_join" -> q41Sql,
    "q42_topk_agg" -> q38Sql) // same semantics, aggregate-shaped plan
}
