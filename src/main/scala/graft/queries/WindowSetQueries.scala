package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.dsum
import graft.plans.{GraftExtensions, RangeJoinRewrite}

/** Remaining OLAP / prep surface: the full window-function family, cube
  * grouping sets, set operations, time-series gap-fill, array round-trips,
  * sketch accuracy gates, and the transparent (optimizer-rule) range join.
  *
  * Everything here is a single-shuffle (or shuffle-free) plan at scale:
  * windows partition by their key, cube/rollup expand inside one partial
  * aggregation, set ops are hash aggregations, and gap-fill generates
  * rows with `sequence` per group instead of joining against a
  * driver-materialized calendar.
  */
object WindowSetQueries {

  private def sqlDsum(e: String) =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,6))) AS DOUBLE)"

  // ---------------------------------------------------------------- q45
  // Window-function family over one pass: lag/lead, ntile, cume_dist and
  // a running (cumulative) sum, all sharing one window spec — Spark plans
  // a single sort+window per partition key, not one per function. The
  // ordering key (o_orderdate, o_orderkey) is unique, so RANGE/ROWS frame
  // semantics coincide and every function is deterministic.
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .select(
        col("o_custkey"), col("o_orderkey"),
        coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0))
          .as("prev_price"),
        coalesce(lead(col("o_totalprice"), 1).over(w), lit(-1.0))
          .as("next_price"),
        ntile(4).over(w).as("quartile"),
        cume_dist().over(w).as("cdist"),
        sum(col("o_totalprice").cast("decimal(28,6)")).over(cum)
          .cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q45Sql =
    """SELECT o_custkey, o_orderkey,
      |  COALESCE(lag(o_totalprice) OVER w, -1.0) AS prev_price,
      |  COALESCE(lead(o_totalprice) OVER w, -1.0) AS next_price,
      |  ntile(4) OVER w AS quartile,
      |  cume_dist() OVER w AS cdist,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q46
  // Full cube over (returnflag, linestatus): all four grouping sets in
  // one shuffle with partial aggregation — the expansion happens inside
  // the aggregate, the fact table is read once. Subtotal NULLs become
  // 'ALL' sentinels (the grouped columns are never null in the data).
  private def q46(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  private val q46Sql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       |  COALESCE(l_linestatus, 'ALL') AS linestatus,
       |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY CUBE(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------- q47
  // Set operations (INTERSECT / EXCEPT, distinct semantics): partition
  // the id universe into orders-only / events-only / both. Spark plans
  // each as a hash aggregation over a shuffled union — no driver-side
  // materialization of either id set.
  private def q47(s: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("id"))
      .distinct()
    val actors = Tables.events(s, dir).select(col("user_id").as("id"))
      .distinct()
    buyers.intersect(actors).withColumn("tag", lit("both"))
      .unionByName(
        buyers.except(actors).withColumn("tag", lit("orders_only")))
      .unionByName(
        actors.except(buyers).withColumn("tag", lit("events_only")))
      .select(col("tag"), col("id"))
      .orderBy(col("tag"), col("id"))
  }

  private val q47Sql =
    """WITH buyers AS (SELECT DISTINCT o_custkey AS id FROM orders),
      |actors AS (SELECT DISTINCT user_id AS id FROM events)
      |SELECT 'both' AS tag, id
      |FROM (SELECT id FROM buyers INTERSECT SELECT id FROM actors)
      |UNION ALL
      |SELECT 'events_only', id
      |FROM (SELECT id FROM actors EXCEPT SELECT id FROM buyers)
      |UNION ALL
      |SELECT 'orders_only', id
      |FROM (SELECT id FROM buyers EXCEPT SELECT id FROM actors)
      |ORDER BY tag, id""".stripMargin

  // ---------------------------------------------------------------- q48
  // Time-series gap-fill: per event type, every hour between that type's
  // first and last event, zero-filled where nothing happened. The hour
  // axis is generated distributed (`sequence` + explode per group), not
  // joined from a driver-built calendar — at 100 TB the span can be years
  // and the group count millions; both stay executor-side here.
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .withColumn("hour_id", expr("(ts DIV 1000000) DIV 3600000"))
    val counts = ev.groupBy(col("event_type"), col("hour_id"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    val hours = ev.groupBy(col("event_type"))
      .agg(min(col("hour_id")).as("lo"), max(col("hour_id")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("hour_id"))
    hours.join(counts, Seq("event_type", "hour_id"), "left")
      .select(col("event_type"), col("hour_id"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("event_type"), col("hour_id"))
  }

  private val q48Sql =
    s"""WITH ev AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS hour_id, value
       |  FROM events),
       |counts AS (
       |  SELECT event_type, hour_id, COUNT(*) AS n,
       |    ${sqlDsum("value")} AS total_value
       |  FROM ev GROUP BY event_type, hour_id),
       |hours AS (
       |  SELECT event_type,
       |    UNNEST(generate_series(MIN(hour_id), MAX(hour_id))) AS hour_id
       |  FROM ev GROUP BY event_type)
       |SELECT h.event_type, h.hour_id,
       |  COALESCE(c.n, 0) AS n,
       |  COALESCE(c.total_value, 0.0) AS total_value
       |FROM hours h LEFT JOIN counts c USING (event_type, hour_id)
       |ORDER BY h.event_type, h.hour_id""".stripMargin

  // ---------------------------------------------------------------- q49
  // Array round-trip: collect per-group sorted arrays, then explode them
  // back with positions. The collect_list state is bounded by the real
  // group fan-out (orders per customer), and posexplode regenerates rows
  // executor-side — the pattern behind per-document token/shingle columns.
  private def q49(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sort_array(collect_list(col("o_orderkey"))).as("keys"))
      .select(col("o_custkey"), posexplode(col("keys")))
      .select(col("o_custkey"), col("pos"), col("col").as("o_orderkey"))
      .orderBy(col("o_custkey"), col("pos"))

  private val q49Sql =
    """WITH l AS (
      |  SELECT o_custkey, list_sort(list(o_orderkey)) AS keys
      |  FROM orders GROUP BY o_custkey)
      |SELECT o_custkey, i - 1 AS pos, keys[i] AS o_orderkey
      |FROM l, UNNEST(generate_series(1, len(keys))) AS t(i)
      |ORDER BY o_custkey, pos""".stripMargin

  // ---------------------------------------------------------------- q50
  // Sketch accuracy gate: per return flag, the HLL++ distinct estimate and
  // the t-digest median must land within tolerance of their exact
  // counterparts (computed in the same pass). The exact values hash-match
  // DuckDB (quantile_cont shares `percentile`'s (n-1)p interpolation);
  // the sketch columns are emitted as booleans the oracle pins to TRUE —
  // if either estimator drifts past tolerance, the gate fails.
  private def q50(s: SparkSession, dir: String): DataFrame =
    // One agg, one scan: the mixed distinct + typed-imperative plan pays
    // a large ONE-TIME Janino compile (~26s cold at sf0.01; measured
    // 0.24s warm vs 0.61s for a split-and-join form that scans twice) —
    // steady-state this single-pass shape wins, and the bench's unbilled
    // warm pass amortizes the compile exactly like a long-running
    // cluster session would.
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_distinct"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("est_distinct"),
        expr("percentile(l_extendedprice, 0.5D)").as("exact_p50"),
        expr("percentile_approx(l_extendedprice, 0.5D, 2000)").as("td_p50"))
      .select(
        col("l_returnflag"), col("exact_distinct"), col("exact_p50"),
        (abs(col("est_distinct").cast("double")
            - col("exact_distinct").cast("double"))
          <= col("exact_distinct").cast("double") * 0.05).as("hll_ok"),
        (abs(col("td_p50") - col("exact_p50"))
          <= col("exact_p50") * 0.02).as("p50_ok"))
      .orderBy(col("l_returnflag"))

  private val q50Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_orderkey) AS exact_distinct,
      |  quantile_cont(l_extendedprice, 0.5) AS exact_p50,
      |  TRUE AS hll_ok,
      |  TRUE AS p50_ok
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------- q122
  // Count-min frequency gate — q50's recipe for the THIRD sketch: the
  // exact per-key counts hash-match DuckDB, and the sketch's two
  // published contracts are emitted as booleans the oracle pins TRUE:
  // estimates never undercount (a hard guarantee of the structure) and
  // stay within eps*N of truth (w.h.p.; deterministic here because the
  // sketch seed is fixed). The sketch bytes and the 6-row exact table
  // are the only driver-side materialization (~112 KB + 6 rows — model
  // scale); a deployment keeps just the sketch and skips the exact
  // pass, which exists here only because a gate needs ground truth.
  private def q122(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 0.001
    val keyed = Tables.lineitem(s, dir)
      .select(concat_ws("|", col("l_returnflag"), col("l_linestatus"))
        .as("k"))
    val bytes = keyed
      .select(graft.operators.Sketches.countMin(col("k"), eps = eps))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val exact = keyed.groupBy("k").agg(count(lit(1)).as("exact_cnt"))
      .as[(String, Long)].collect().sortBy(_._1)
    val n = exact.map(_._2).sum
    exact.toSeq.map { case (k, c) =>
      val est = cms.estimateCount(k)
      (k, c, est >= c, est <= c + (eps * n).toLong + 1)
    }.toDF("k", "exact_cnt", "cm_lower_ok", "cm_eps_ok")
      .orderBy(col("k"))
  }

  private val q122Sql =
    """SELECT concat_ws('|', l_returnflag, l_linestatus) AS k,
      |  count(*) AS exact_cnt,
      |  TRUE AS cm_lower_ok,
      |  TRUE AS cm_eps_ok
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY k""".stripMargin

  // --------------------------------------------------------------- q160
  // Deterministic HLL distinct-count gate — the FOURTH sketch, and the
  // first whose ESTIMATE (not just its contracts) the oracle replays
  // bit-for-bit: per-source distinct-token counts estimated by
  // Sketches.deterministicHll (md5-60-bit hash, bin()-length ranks,
  // exact-integer register sums — every step engine-portable), joined to
  // the exact counts so the row also publishes the realized relative
  // error. approx_count_distinct stays the production default; this form
  // is the auditable twin whose sketch any SQL engine can rebuild.
  private def q160(s: SparkSession, dir: String): DataFrame = {
    // value = distinct word 4-grams per source: the shingle-space size a
    // dedup planner budgets against, and a cardinality that exercises the
    // estimator's working regime at sf0.01+ (p=8 -> m=256); the rel_err
    // column self-reports the small-corpus linear-counting regime rather
    // than hiding it behind an engine-unpinnable ln() correction
    // r16: materialize the token array BEFORE shingling — handing
    // tokens(text) straight to the transform lambda re-splits the doc
    // once per shingle (the documented shinglesOfTokens trap; measured
    // 2.5 s → ~0.3 s single-task at sf0.1)
    val t = Tables.documents(s, dir)
      .select(col("source"),
        graft.functions.TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("source"),
        explode(array_distinct(graft.functions.TextAnalysis
          .shinglesOfTokens(col("_toks"), 4))).as("gram"))
    // r16: fused single-pass form — the two-branch original (exact
    // countDistinct + sketch, joined) scanned and shingle-exploded the
    // corpus twice; both answers derive from the distinct (source, gram)
    // set, so Sketches.deterministicHllWithExact computes them in one
    // scan with no join (values identical; SketchSpec pins parity)
    val fused = graft.operators.Sketches.deterministicHllWithExact(
      t, Seq("source"), "gram", p = 8)
    val err = abs(col("hll_estimate") - col("n_exact").cast("double")) /
      col("n_exact").cast("double")
    fused
      .select(col("source"), col("n_exact"), col("buckets_hit"),
        col("s_int"), col("hll_estimate"), round(err, 6).as("rel_err"))
      .orderBy(col("source"))
  }

  private val q160Sql = {
    val q = 52 // 60 - p at p = 8
    val m = 256
    val twoQ = 1L << q
    val twoQ1 = 1L << (q + 1)
    val toks = """string_split_regex(trim(text), '\s+')"""
    s"""WITH t AS (
       |  SELECT source, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len($toks) - 3, 0)),
       |    i -> concat_ws(' ', $toks[i], $toks[i+1],
       |                   $toks[i+2], $toks[i+3])))) AS gram
       |  FROM documents),
       |h AS (
       |  SELECT source, gram,
       |    CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS hh
       |  FROM t),
       |r AS (
       |  SELECT source, hh // $twoQ AS bucket,
       |    CASE WHEN hh % $twoQ = 0 THEN ${q + 1}
       |         ELSE ${q + 1} - length(bin(hh % $twoQ)) END AS rho
       |  FROM h),
       |regs AS (SELECT source, bucket, max(rho) AS reg
       |         FROM r GROUP BY source, bucket),
       |agg AS (
       |  SELECT source, count(*) AS buckets_hit,
       |    CAST(sum(CAST(1 AS BIGINT) << (${q + 1} - reg)) AS BIGINT) AS sp
       |  FROM regs GROUP BY source),
       |st AS (
       |  SELECT source, buckets_hit,
       |    sp + ($m - buckets_hit) * $twoQ1 AS s_int
       |  FROM agg),
       |est AS (
       |  SELECT source, buckets_hit, s_int,
       |    round((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
       |        + CAST(1.079 AS DOUBLE) / $m)) * $m * $m
       |      * $twoQ1 / CAST(s_int AS DOUBLE), 3) AS hll_estimate
       |  FROM st),
       |ex AS (SELECT source, count(DISTINCT gram) AS n_exact
       |       FROM t GROUP BY source)
       |SELECT e.source, x.n_exact, e.buckets_hit, e.s_int, e.hll_estimate,
       |  round(abs(e.hll_estimate - CAST(x.n_exact AS DOUBLE))
       |    / CAST(x.n_exact AS DOUBLE), 6) AS rel_err
       |FROM est e JOIN ex x USING (source)
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------- q51
  // Transparent range join: the query is written as a PLAIN non-equi
  // inner join — no manual bucketing — and graft's RangeJoinRewrite
  // optimizer rule (registered on the live session, enabled by the
  // bucketWidth conf) turns it into the bucketed equi-join at planning
  // time. Same rows as the naive nested-loop plan, shuffle-join shape at
  // scale. q35 is the hand-bucketed form; this is the end-to-end rule
  // path the driver actually executes.
  private def q51(s: SparkSession, dir: String): DataFrame = {
    GraftExtensions.register(s)
    s.conf.set(RangeJoinRewrite.WidthConf, "10000")
    val bands = s.range(0, 60).toDF("band_id")
      .select(col("band_id"), (col("band_id") * 10000.0).as("lo"),
        ((col("band_id") + 1) * 10000.0).as("hi"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
      .join(bands,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("band_id"))
  }

  private val q51Sql =
    s"""WITH bands AS (
       |  SELECT i AS band_id, i * 10000.0 AS lo, (i + 1) * 10000.0 AS hi
       |  FROM range(0, 60) t(i))
       |SELECT band_id, COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS total
       |FROM orders JOIN bands
       |  ON o_totalprice >= lo AND o_totalprice < hi
       |GROUP BY band_id ORDER BY band_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_window_family" -> (q45 _),
    "q46_cube" -> (q46 _),
    "q47_setops" -> (q47 _),
    "q48_gapfill" -> (q48 _),
    "q49_array_explode" -> (q49 _),
    "q50_sketch_accuracy" -> (q50 _),
    "q122_countmin_accuracy" -> (q122 _),
    "q160_hll_distinct" -> (q160 _),
    "q51_range_join_auto" -> (q51 _))

  val oracleSql: Map[String, String] = Map(
    "q45_window_family" -> q45Sql,
    "q46_cube" -> q46Sql,
    "q47_setops" -> q47Sql,
    "q48_gapfill" -> q48Sql,
    "q49_array_explode" -> q49Sql,
    "q50_sketch_accuracy" -> q50Sql,
    "q122_countmin_accuracy" -> q122Sql,
    "q160_hll_distinct" -> q160Sql,
    "q51_range_join_auto" -> q51Sql)
}
