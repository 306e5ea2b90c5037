package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference's pandas pipeline has no analog for but
  * any event/transaction warehouse needs (pandas offers them as
  * `merge_asof`; SURVEY §2.9's join family is the nearest reference
  * surface).
  *
  * Scale design: the naive formulation — for each left row, scan the right
  * side for the latest earlier row — is a non-equi join that Spark can only
  * execute as a broadcast-nested-loop (right side must fit on one executor)
  * or a per-row LATERAL re-sort. Neither survives two large inputs. The
  * implementation here is the union+fill formulation instead: tag both
  * sides, union them, and run ONE window pass per key ordered by time,
  * carrying the most recent right-side values forward into each left row.
  * Cost at any scale = one shuffle of (|L|+|R|) rows on the key plus a
  * partition-local sort — the same plan shape as a windowed aggregation,
  * no replication, no nested loop, AQE-splittable on skewed keys.
  */
object TemporalJoin {

  /** Backward as-of join (pandas `merge_asof(direction="backward")`):
    * for every left row, attach `valueCols` from the LATEST right row of
    * the same `key` with `right.ts <= left.ts` (inclusive), or nulls when
    * no such row exists. `tolerance` (same unit as `ts`) drops matches
    * older than `left.ts - tolerance`.
    *
    * Right rows must be unique per (key, ts) — pre-aggregate the right
    * side otherwise (ties would make "the latest row" ill-defined in any
    * engine). Emits all left columns plus, per right value column `v`,
    * `<v>_asof`, and `ts_asof` (the matched right timestamp).
    */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
                   ts: String, valueCols: Seq[String],
                   tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("_side"), "left must not contain _side")

    // shared union schema: key, ts, _side, every left col, every right value
    val taggedLeft = left
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col(ts).as("_ts"), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        valueCols.map(v => lit(null).cast(right.schema(v).dataType)
          .as(s"_r_$v")): _*)
    val taggedRight = right
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col(ts).as("_ts"), col("_side")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(v => col(v).as(s"_r_$v")): _*)

    // one key-partitioned pass; at equal ts the right row (side 0) sorts
    // first, so the left row sees it — inclusive as-of
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withFill = taggedLeft.unionByName(taggedRight)
      .withColumn("_ts_asof",
        last(when(col("_side") === 0, col("_ts")), ignoreNulls = true)
          .over(w))
    val filled = valueCols.foldLeft(withFill) { (df, v) =>
      df.withColumn(s"${v}_asof",
        last(col(s"_r_$v"), ignoreNulls = true).over(w))
    }

    val inTol: Column = tolerance match {
      case Some(t) => col("_ts_asof").isNotNull &&
        (col("_ts") - col("_ts_asof")) <= t
      case None => col("_ts_asof").isNotNull
    }
    val out = filled
      .filter(col("_side") === 1)
      .withColumn("ts_asof", when(inTol, col("_ts_asof")))
    valueCols.foldLeft(out) { (df, v) =>
      df.withColumn(s"${v}_asof", when(inTol, col(s"${v}_asof")))
    }
      .select(Seq(col(key), col("_ts").as(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        (Seq("ts_asof") ++ valueCols.map(v => s"${v}_asof")).map(col): _*)
  }

  /** Broadcast backward as-of join — same semantics and output schema as
    * [[asOfBackward]], for the SMALL-right-side case (rate tables, config
    * history: thousands-to-millions of rows, not billions).
    *
    * The right side packs into one row per key (sorted array of
    * (ts, values) structs) and BROADCASTS; each left row then
    * binary-searches the packed array with the codegen'd
    * [[graft.plans.SortedLastLeq]] probe. The left side never shuffles
    * and never sorts — a map-only pass at any left scale, vs the
    * union+window form's shuffle of |L|+|R| rows. `ts` must be integral
    * (long); right rows unique per (key, ts).
    */
  /** Backward as-of join on the dedicated physical operator
    * ([[graft.plans.AsOfJoin.AsOfJoinExec]]) — same semantics as
    * [[asOfBackward]], output schema `left.* ++ (ts_asof, <v>_asof…)`
    * (left column order preserved; use a select for asOfBackward's
    * key-first order).
    *
    * vs the union+window form: both shuffle |L|+|R| rows, but here each
    * side keeps its OWN schema (the union pads every row with null slots
    * for the other side's columns), the sorts are per-side codegen'd
    * UnsafeSorts, and the merge streams with one held right record
    * instead of a WindowExec buffering the merged partition. `ts` must
    * be integral on both sides; right rows unique per (key, ts).
    */
  def asOfMerge(left: DataFrame, right: DataFrame, key: String,
                ts: String, valueCols: Seq[String],
                tolerance: Option[Long] = None): DataFrame = {
    import graft.plans.AsOfJoin
    val spark = left.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val l = left.withColumn(ts, col(ts).cast("long"))
    val r = right.withColumn(ts, col(ts).cast("long"))
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n"))
    val rightVals = valueCols.map(attr(rPlan, _))
    val asofOut =
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "ts_asof", org.apache.spark.sql.types.LongType)() +:
        rightVals.map(v =>
          org.apache.spark.sql.catalyst.expressions.AttributeReference(
            s"${v.name}_asof", v.dataType)())
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      AsOfJoin.AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(lPlan, ts),
        attr(rPlan, key), attr(rPlan, ts),
        rightVals, asofOut, tolerance))
  }

  def asOfBroadcast(left: DataFrame, right: DataFrame, key: String,
                    ts: String, valueCols: Seq[String],
                    tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // (ts, values) structs sort by leading _ts; (key, ts) unique input
    // makes the order total and the pack deterministic
    val packed = right
      .groupBy(col(key))
      .agg(array_sort(collect_list(struct(
        Seq(col(ts).cast("long").as("_ts")) ++
          valueCols.map(v => col(v).as(s"_r_$v")): _*))).as("_packed"))
      .withColumn("_ts_arr",
        transform(col("_packed"), p => p.getField("_ts")))

    val probed = left
      .join(broadcast(packed), Seq(key), "left")
      .withColumn("_idx",
        graft.plans.SetExpressions.sortedLastLeq(
          col("_ts_arr"), col(ts).cast("long")))
      .withColumn("_hit",
        col("_idx").isNotNull && col("_idx") >= 0 &&
          (tolerance match {
            case Some(t) =>
              element_at(col("_ts_arr"), col("_idx") + 1) >=
                col(ts).cast("long") - t
            case None => lit(true)
          }))
      .withColumn("_m",
        when(col("_hit"), element_at(col("_packed"), col("_idx") + 1)))

    val out = probed
      .withColumn("ts_asof", col("_m").getField("_ts"))
    valueCols.foldLeft(out) { (df, v) =>
      df.withColumn(s"${v}_asof", col("_m").getField(s"_r_$v"))
    }
      .select(Seq(col(key), col(ts)) ++
        leftCols.filterNot(c => c == key || c == ts).map(col) ++
        (Seq("ts_asof") ++ valueCols.map(v => s"${v}_asof")).map(col): _*)
  }
}
