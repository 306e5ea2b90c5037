package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` draws per-row randoms — results depend on partitioning
  * and rerun history, which is unacceptable for a training corpus (the
  * same document must land in the same fold on every run, on every
  * cluster size, forever). Hash-based assignment is the standard fix:
  * fold = H(key) mod folds. A pure projection — no shuffle, no state —
  * and stable across engines, so holdout membership survives a platform
  * migration.
  */
object Splits {

  /** Portable deterministic fold id in [0, folds): first 15 hex chars of
    * md5(key as string) as an integer, mod folds. md5-derived (rather
    * than xxhash64) so any engine can reproduce the assignment — DuckDB:
    * `CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS
    * BIGINT) % folds`.
    */
  def deterministicFold(key: Column, folds: Int): Column = {
    require(folds > 0, "folds must be positive")
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(folds))
  }

  /** Attach a fold column keyed on `keyCol`. Split at the GROUPING KEY
    * that must not leak across folds — e.g. key on user_id, not event_id,
    * so every event of a user lands in the same fold (leakage-safe
    * grouped split); key on a content hash to make exact duplicates
    * co-fold.
    */
  def assignFolds(df: DataFrame, keyCol: String, folds: Int,
                  foldCol: String = "fold"): DataFrame =
    df.withColumn(foldCol, deterministicFold(col(keyCol), folds))
}
