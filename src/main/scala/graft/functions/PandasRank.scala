package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pandas `Series.rank(pct=True, method='average')` semantics on Spark.
  *
  * The reference engine ranks RFM metrics with pandas' default rank
  * (reference: db_to_RFManalysis.py:153-155, db_to_Payment_RFM.py:101-103,
  * db_to_card_RFM.py:47-48). That is NOT SQL `percent_rank()`:
  *
  *   - ties receive the *average* of the row numbers they span, not the
  *     minimum rank;
  *   - the divisor is n, not n-1, so results are in (0, 1].
  *
  * For a value v with `rank` = number of rows strictly before the tie group
  * plus one (SQL RANK()) and `ties` = size of the tie group:
  *
  *   avg_rank = rank + (ties - 1) / 2 = (2*rank - 1 + ties) / 2
  *   pct      = avg_rank / n
  *
  * Expressed purely with window built-ins so it stays inside whole-stage
  * codegen; no UDF, no extra shuffle beyond the single sort the rank needs.
  * The arithmetic shape `(2*rank - 1 + ties) / 2 / n` is kept identical in
  * the DuckDB oracle SQL so the double results are bit-identical.
  */
object PandasRank {

  /** Percentile rank of `value` over the whole frame (optionally per
    * partition), ascending or descending, pandas-average semantics.
    *
    * At scale, a global rank implies a single-direction sort; Spark plans a
    * range-partitioned sort + window, which parallelizes — but prefer ranking
    * *after* aggregation (group cardinality, not fact cardinality), exactly
    * as the reference ranks post-RFM aggregates.
    */
  def pctRank(value: Column, ascending: Boolean = true,
              partitionBy: Seq[Column] = Seq.empty): Column = {
    val ordered = if (ascending) value.asc else value.desc
    val wOrd  = Window.partitionBy(partitionBy: _*).orderBy(ordered)
    val wTies = Window.partitionBy(partitionBy :+ value: _*)
    val wAll  = Window.partitionBy(partitionBy: _*)
    (lit(2) * rank().over(wOrd) - lit(1) + count(lit(1)).over(wTies))
      .cast("double") / lit(2.0) / count(lit(1)).over(wAll).cast("double")
  }

  /** Distributed pandas-pct-rank: identical results to [[pctRank]] without
    * a global single-partition window over the FACT rows. Tie counts come
    * from a groupBy on the value (two-phase agg); the ordered cumulative
    * sum runs over the DISTINCT-VALUE table (cardinality |values|, not
    * |rows|); the ranks join back on the value (broadcast when small).
    * This is the 100 TB path for ranking un-aggregated columns.
    *
    * Integer arithmetic `2*rank - 1 + ties` is kept exact and divided in
    * the same fp order as [[pctRank]] / the oracle SQL, so results are
    * bit-identical. Null values must be filtered by the caller (pandas
    * excludes NaN from ranks; the reference never ranks nullable columns).
    */
  def pctRankJoined(df: org.apache.spark.sql.DataFrame, valueCol: String,
                    outCol: String, ascending: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val ordered = if (ascending) col(valueCol).asc else col(valueCol).desc
    val wCum = Window.orderBy(ordered)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
    val ranked = df.groupBy(valueCol).agg(count(lit(1)).as("_cnt"))
      .withColumn("_before", coalesce(sum(col("_cnt")).over(wCum), lit(0L)))
      .withColumn("_n", sum(col("_cnt")).over(wAll))
      .withColumn(outCol,
        (lit(2) * (col("_before") + lit(1)) - lit(1) + col("_cnt"))
          .cast("double") / lit(2.0) / col("_n").cast("double"))
      .select(col(valueCol), col(outCol))
    df.join(ranked, Seq(valueCol))
  }

  /** The same formula as raw SQL text (for oracle parity / spark.sql use). */
  def sqlExpr(value: String, ascending: Boolean,
              partition: Option[String] = None): String = {
    val part = partition.map(p => s"PARTITION BY $p ").getOrElse("")
    val dir = if (ascending) "ASC" else "DESC"
    val tiePart = partition.map(p => s"$p, ").getOrElse("")
    s"CAST(2 * RANK() OVER (${part}ORDER BY $value $dir) - 1 + " +
      s"COUNT(*) OVER (PARTITION BY $tiePart$value) AS DOUBLE) / 2.0 / " +
      s"CAST(COUNT(*) OVER (${partition.map(p => s"PARTITION BY $p").getOrElse("")}) AS DOUBLE)"
  }
}
