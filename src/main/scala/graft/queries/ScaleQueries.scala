package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.dsum
import graft.operators.{RangeJoin, Skew, TemporalJoin}

/** Scale-pattern operators (beyond the reference surface): as-of join,
  * bucketed range join, salted skew join, exact distribution stats. Each
  * is the join/agg shape that breaks first on a 1000-executor cluster,
  * implemented in its scale-safe formulation and oracle-checked against
  * the naive (small-data) formulation in DuckDB — the results must be
  * identical, only the plan differs.
  */
object ScaleQueries {

  private def sqlDsum(e: String) =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  // ---------------------------------------------------------------- q34
  // Backward as-of join with tolerance: each purchase picks up the user's
  // latest click within the preceding hour. Union+window formulation (one
  // shuffle) vs DuckDB's LATERAL top-1 per row.
  private val asofTolMs = 3600000L // 1 hour

  private def q34(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ms", expr("ts DIV 1000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    // unique (key, ts) on the right: latest-click value per millisecond
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("value")).as("click_value"))
    TemporalJoin.asOfBackward(purchases, clicks, key = "user_id", ts = "ms",
        valueCols = Seq("click_value"), tolerance = Some(asofTolMs))
      .select(col("event_id"), col("user_id"), col("ms"),
        coalesce(col("ts_asof"), lit(-1L)).as("click_ms"),
        coalesce(col("click_value_asof"), lit(-1.0)).as("click_value"))
      .orderBy(col("event_id"))
  }

  private val q34Sql =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_ms(ts) AS ms, value, event_type
       |  FROM events),
       |purchases AS (
       |  SELECT event_id, user_id, ms FROM ev WHERE event_type = 'purchase'),
       |clicks AS (
       |  SELECT user_id, ms, MAX(value) AS click_value
       |  FROM ev WHERE event_type = 'click' GROUP BY user_id, ms)
       |SELECT p.event_id, p.user_id, p.ms,
       |  COALESCE(c.ms, -1) AS click_ms,
       |  COALESCE(c.click_value, -1.0) AS click_value
       |FROM purchases p
       |LEFT JOIN LATERAL (
       |  SELECT ms, click_value FROM clicks c
       |  WHERE c.user_id = p.user_id AND c.ms <= p.ms
       |    AND c.ms >= p.ms - $asofTolMs
       |  ORDER BY c.ms DESC LIMIT 1) c ON true
       |ORDER BY p.event_id""".stripMargin

  // ---------------------------------------------------------------- q73
  // Same as-of semantics as q34, via the BROADCAST formulation: the
  // click history packs to one sorted array per user and broadcasts;
  // purchases binary-search it (SortedLastLeq) — the purchases side
  // never shuffles. Same oracle as q34: two plans, one truth.
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ms", expr("ts DIV 1000000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("value")).as("click_value"))
    TemporalJoin.asOfBroadcast(purchases, clicks, key = "user_id",
        ts = "ms", valueCols = Seq("click_value"),
        tolerance = Some(asofTolMs))
      .select(col("event_id"), col("user_id"), col("ms"),
        coalesce(col("ts_asof"), lit(-1L)).as("click_ms"),
        coalesce(col("click_value_asof"), lit(-1.0)).as("click_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q35
  // Bucketed point-in-interval join: orders priced into 5k bands plus one
  // full-domain band (an interval spanning ~100 buckets — the expansion
  // path). Equi-join on bucket + exact recheck vs DuckDB's plain
  // non-equi predicate join.
  private def q35(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 100).toDF("band_id")
      .select(col("band_id"), (col("band_id") * 5000.0).as("lo"),
        ((col("band_id") + 1) * 5000.0).as("hi"))
      .unionByName(s.range(999, 1000).toDF("band_id")
        .select(col("band_id"), lit(0.0).as("lo"), lit(500000.0).as("hi")))
    RangeJoin.pointInInterval(
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", bands, "lo", "hi", bucketWidth = 5000.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("band_id"))
  }

  private val q35Sql =
    s"""WITH bands AS (
       |  SELECT i AS band_id, i * 5000.0 AS lo, (i + 1) * 5000.0 AS hi
       |  FROM range(0, 100) t(i)
       |  UNION ALL
       |  SELECT CAST(999 AS BIGINT), 0.0, 500000.0),
       |joined AS (
       |  SELECT band_id, o_totalprice
       |  FROM orders JOIN bands
       |    ON o_totalprice >= lo AND o_totalprice < hi)
       |SELECT band_id, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM joined GROUP BY band_id ORDER BY band_id""".stripMargin

  // ---------------------------------------------------------------- q36
  // Salted equi-join: events fact onto a customer dim spread over 8 salt
  // subkeys (the explicit-skew-mitigation path when AQE can't re-plan).
  // Salting is plan-only — the oracle is the plain join.
  private def q36(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(fact, dim, key = "user_id", salt = 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  private val q36Sql =
    s"""SELECT c_mktsegment, event_type, COUNT(*) AS n,
       |  ${sqlDsum("value")} AS total_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment, event_type
       |ORDER BY c_mktsegment, event_type""".stripMargin

  // ---------------------------------------------------------------- q37
  // Exact grouped quantiles (linear interpolation) + extrema — the
  // distribution-profiling agg. Spark `percentile` and DuckDB
  // `quantile_cont` share the (n-1)p interpolation formula, so the
  // doubles hash-match exactly.
  private def q37(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("p_min"),
        expr("percentile(l_extendedprice, 0.25D)").as("p25"),
        expr("percentile(l_extendedprice, 0.5D)").as("p50"),
        expr("percentile(l_extendedprice, 0.75D)").as("p75"),
        expr("percentile(l_extendedprice, 0.9D)").as("p90"),
        max(col("l_extendedprice")).as("p_max"))
      .orderBy(col("l_returnflag"))

  private val q37Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  MIN(l_extendedprice) AS p_min,
      |  quantile_cont(l_extendedprice, 0.25) AS p25,
      |  quantile_cont(l_extendedprice, 0.5) AS p50,
      |  quantile_cont(l_extendedprice, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9) AS p90,
      |  MAX(l_extendedprice) AS p_max
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q78
  // Same as-of semantics a THIRD way: the dedicated physical operator
  // (AsOfJoinExec — custom LogicalPlan/Strategy/SparkPlan). Each side
  // shuffles with its own schema and the merge streams one held record
  // per partition, replacing q34's padded union + WindowExec. Same
  // oracle as q34/q73: three plans, one truth.
  private def q78(s: SparkSession, dir: String): DataFrame = {
    // two independent reads: fresh exprIds per side keep the self-join
    // unambiguous for the custom binary node
    val purchases = Tables.events(s, dir)
      .withColumn("ms", expr("ts DIV 1000000"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val clicks = Tables.events(s, dir)
      .withColumn("ms", expr("ts DIV 1000000"))
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ms"))
      .agg(max(col("value")).as("click_value"))
    TemporalJoin.asOfMerge(purchases, clicks, key = "user_id", ts = "ms",
        valueCols = Seq("click_value"), tolerance = Some(asofTolMs))
      .select(col("event_id"), col("user_id"), col("ms"),
        coalesce(col("ts_asof"), lit(-1L)).as("click_ms"),
        coalesce(col("click_value_asof"), lit(-1.0)).as("click_value"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_asof_join" -> (q34 _),
    "q35_range_join" -> (q35 _),
    "q36_salted_join" -> (q36 _),
    "q37_quantiles" -> (q37 _),
    "q73_asof_broadcast" -> (q73 _),
    "q78_asof_merge" -> (q78 _))

  val oracleSql: Map[String, String] = Map(
    "q34_asof_join" -> q34Sql,
    "q35_range_join" -> q35Sql,
    "q36_salted_join" -> q36Sql,
    "q37_quantiles" -> q37Sql,
    "q73_asof_broadcast" -> q34Sql,
    "q78_asof_merge" -> q34Sql)
}
