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
