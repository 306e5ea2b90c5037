package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Single-pass data profiling: per-column row/null/distinct counts and
  * numeric min/max, emitted one row per column.
  *
  * All statistics compute in ONE aggregation over ONE scan — the
  * multi-distinct plan expands rows (one replica per distinct column)
  * but never rescans; at 100 TB that beats a per-column loop by the
  * column count. The 1×N stats row then melts to N rows executor-side.
  * Non-numeric columns report min/max as the -1.0 sentinel so the
  * output stays NULL-free for hash-comparison.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val schema = df.schema
    def isNum(c: String) =
      schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        countDistinct(col(c)).as(s"${c}__nd")) ++
        (if (isNum(c))
           Seq(min(col(c)).cast("double").as(s"${c}__min"),
             max(col(c)).cast("double").as(s"${c}__max"))
         else Seq.empty)
    }
    val statsRow = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"${c}__n")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        (if (isNum(c)) coalesce(col(s"${c}__min"), lit(-1.0))
         else lit(-1.0)).as("min_num"),
        (if (isNum(c)) coalesce(col(s"${c}__max"), lit(-1.0))
         else lit(-1.0)).as("max_num"))
    }
    statsRow
      .select(explode(array(perCol: _*)).as("s"))
      .select(col("s.*"))
      .orderBy(col("col_name"))
  }
}
