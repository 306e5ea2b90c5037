package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth (quantile-bucket) histograms with a measured, size-routed
  * strategy — the unified entry point behind the q67/q77 query pair.
  *
  * One semantic, three physical plans, picked from the input row count
  * (callers pass `knownCount` when they have footer counts, the q67
  * `Tables.rowCount` pattern, so the pick costs nothing):
  *
  *  - `n <= windowMaxRows`: plain per-group `ntile` window — exact, one
  *    task per group, the right plan while every group fits a task;
  *  - `<= exactMaxRows`: [[graft.functions.PandasRank.groupedNtileScalable]]
  *    — still EXACT (identical bucket assignment, hash-proven against
  *    the same oracle), but range-partitioned with parallelism =
  *    shuffle partitions and NO WindowExec, so three giant groups no
  *    longer mean three tasks (the ×100 soak measured the window form
  *    at 68 s vs 27 s routed);
  * NULL `valueCol` rows are excluded up front, on every route: the
  * window arm's ntile would seat them in bucket 1 (NULLS FIRST) while
  * the sketch arm's when-chain would fall through to bucket k — a
  * route-dependent placement. A histogram of a value has nothing to
  * say about rows without one; callers that care count them separately.
  *
  *  - above: sketch-boundary form — quantile BOUNDARIES from
  *    `percentile_approx` (fixed-size GK sketches, map-side combinable),
  *    broadcast, bucket assignment a codegen'd projection feeding a
  *    hash agg. Each stage parallelizes with the data and the whole op
  *    is two scans of a two-column projection; depths are N/k ± ε
  *    (sketch accuracy), which is the contract a 100 TB histogram
  *    actually wants. Exact forms order by (value ++ tieBreakCols); the
  *    sketch form buckets by value alone — equal values land in one
  *    bucket, ties across a boundary go low.
  *
  * Output schema is identical on every route:
  * (groupCols…, bucket, n, lo, hi).
  */
object Histograms {

  def equiDepth(df: DataFrame, groupCols: Seq[String], valueCol: String,
                tieBreakCols: Seq[String], k: Int,
                windowMaxRows: Long = 1L << 20,
                exactMaxRows: Long = 1L << 26,
                accuracy: Int = 10000,
                knownCount: Option[Long] = None): DataFrame = {
    require(k >= 1, "k >= 1")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // route-invariant NULL policy (see scaladoc); a caller-passed
    // footer count is then an upper bound, which only ever routes
    // toward the more scalable arm — safe for a size heuristic
    val data = df.filter(col(valueCol).isNotNull)
    val n = knownCount.getOrElse(data.count())
    val bucketed =
      if (n <= windowMaxRows) {
        val w = Window.partitionBy(groupCols.map(col): _*)
          .orderBy((valueCol +: tieBreakCols).map(col): _*)
        data.withColumn("bucket", ntile(k).over(w))
      } else if (n <= exactMaxRows) {
        graft.functions.PandasRank.groupedNtileScalable(
          data.select((groupCols ++ (valueCol +: tieBreakCols)).distinct
            .map(col): _*),
          groupCols, valueCol +: tieBreakCols, k, outCol = "bucket")
      } else if (k == 1) {
        data.withColumn("bucket", lit(1))
      } else {
        val bounds = data.groupBy(groupCols.map(col): _*)
          .agg(expr(s"percentile_approx($valueCol, array(" +
            (1 until k).map(i => s"${i.toDouble / k}D").mkString(", ") +
            s"), $accuracy)").as("_bs"))
        val assign = (1 until k).foldLeft(
            when(lit(false), lit(0))) { (acc, i) =>
          acc.when(col(valueCol) <= col("_bs").getItem(i - 1), i)
        }.otherwise(k)
        data.join(broadcast(bounds), groupCols)
          .withColumn("bucket", assign)
      }
    bucketed
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
  }
}
