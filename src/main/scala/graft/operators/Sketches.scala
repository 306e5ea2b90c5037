package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate, mergeable aggregates for 100 TB-scale profiling, where
  * exact forms stop being an option:
  *
  *   - distinct counts: exact COUNT(DISTINCT) shuffles every distinct
  *     value; the HLL sketch is O(kB) per group, mergeable across
  *     partitions AND across materialized runs (store the sketch bytes,
  *     union later — incremental corpus stats without a rescan);
  *   - quantiles: exact `percentile` buffers every value per group;
  *     `approx_percentile` (t-digest) holds bounded state at a declared
  *     accuracy;
  *   - frequencies: `count_min_sketch` gives biased-upward counts of any
  *     item in fixed memory (eps/confidence chosen at call site).
  *
  * All are Spark built-ins (codegen'd / imperative aggs) — this module is
  * the engine's stable surface for them, plus the sketch-merge idioms the
  * raw functions make awkward. Exactness trade-offs are spec-tested
  * against the exact forms (SketchSpec).
  */
object Sketches {

  /** HLL++ approximate distinct count (relative error ~`relativeSD`). */
  def approxDistinct(c: Column, relativeSD: Double = 0.02): Column =
    approx_count_distinct(c, relativeSD)

  /** Apache DataSketches HLL sketch bytes for `c` — store these per
    * partition/day/shard, then [[mergeDistinct]] them later: distinct
    * counts compose without touching the raw data again.
    */
  def distinctSketch(c: Column, lgK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgK))

  /** Union previously-built HLL sketches and estimate the combined
    * distinct count.
    */
  def mergeDistinct(sketchCol: Column): Column =
    hll_sketch_estimate(hll_union_agg(sketchCol))

  /** t-digest approximate percentiles; `accuracy` trades memory for
    * rank error (~1/accuracy).
    */
  def approxQuantiles(c: Column, percentiles: Seq[Double],
                      accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(percentiles.map(lit): _*), lit(accuracy))

  /** Count-min sketch bytes over `c` (read back with
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`). Estimates
    * are >= the true count and <= true + eps·N at the given confidence.
    */
  def countMin(c: Column, eps: Double = 0.001,
               confidence: Double = 0.99, seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))

  /** Per-group distinct-count profile of `df` — the shape a corpus-stats
    * job runs daily at scale: one pass, O(kB) state per group.
    */
  def distinctProfile(df: DataFrame, groupCols: Seq[String],
                      valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approxDistinct(col(valueCol)).as("approx_distinct"),
        count(col(valueCol)).as("n"))
}
