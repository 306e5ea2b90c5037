package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Point-in-interval joins (`p >= lo AND p < hi`) at scale.
  *
  * Spark plans a raw non-equi predicate as a broadcast-nested-loop join —
  * fine while the interval side broadcasts, quadratic disaster once both
  * sides are large. The standard fix (used by every range-join-capable
  * engine, e.g. Databricks' range-join hints and Flink's interval joins)
  * is bucketing: quantize the domain into fixed-width buckets, expand each
  * interval to the buckets it overlaps, equi-join on the bucket id, then
  * re-check the exact predicate. The non-equi join becomes a shuffled
  * hash/sort-merge equi-join with ~(1 + width/avg_interval) replication —
  * both sides arbitrarily large, AQE- and skew-compatible.
  */
object RangeJoin {

  /** Inner join of `points` rows onto every `intervals` row whose
    * `[lo, hi)` contains `pointCol`. `bucketWidth` trades replication for
    * join selectivity — pick ≈ the typical interval width so each interval
    * lands in O(1) buckets.
    *
    * Each matching (point, interval) pair meets in exactly one bucket (the
    * point's), so no post-join dedup is needed. Intervals with lo == hi
    * are empty and never match. Columns `_bucket` must not pre-exist.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b: Column => Column = c => floor(c / bucketWidth).cast("long")
    val bucketedPoints = points.withColumn("_bucket", b(col(pointCol)))
    // hi is exclusive: an interval ending exactly on a bucket boundary
    // must not be expanded into the bucket it doesn't reach. The epsilon-
    // free way: expand to floor(lo/w) .. floor(hi/w), then let the exact
    // predicate kill the one boundary false-positive bucket.
    val bucketedIntervals = intervals
      .withColumn("_bucket",
        explode(sequence(b(col(loCol)), b(col(hiCol)))))
    bucketedPoints
      .join(bucketedIntervals, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
