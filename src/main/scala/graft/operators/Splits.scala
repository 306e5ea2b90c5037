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

  /** Reproducible global corpus shuffle — the "shuffle once, write S
    * shard files" step every training run depends on: each row gets a
    * shard (md5-fold of its id, so the assignment is engine-portable
    * and stable under re-runs, repartitioning, and insertion order) and
    * a position within that shard (rank by (md5 hex, id) — the hash
    * makes the order pseudo-random, the id breaks the measure-zero
    * hash-collision tie). Reading shard files in position order replays
    * the exact same training order on any engine, any cluster size, any
    * day.
    *
    * Scale shape: ONE hash shuffle on the shard key + a per-shard sort —
    * the tera-sort pattern. `shards` is a deploy knob (thousands at
    * 100 TB) bounding both the sort's partition size and the output
    * file count; there is no global sort and no driver state. The rank
    * is a window per shard, whose parallelism ceiling IS the shard
    * count — size shards to the cluster exactly like q85's packing
    * groups.
    *
    * PRECONDITION: `idCol` must be UNIQUE. Two rows sharing an id share
    * the whole sort key, so their relative positions are
    * engine/partitioning-dependent — exactly the drift this operator
    * exists to prevent. Dedup first (the id is usually a content hash
    * or surrogate key, unique by construction); when the input's
    * provenance is uncertain, pass `requireUniqueIds = true` to spend
    * one aggregate proving it and fail loudly instead of silently
    * emitting an irreproducible order.
    */
  def corpusShuffle(df: DataFrame, idCol: String, shards: Int,
                    shardCol: String = "shard",
                    posCol: String = "pos",
                    requireUniqueIds: Boolean = false): DataFrame = {
    require(shards > 0, "shards must be positive")
    if (requireUniqueIds) {
      val r = df.agg(count(col(idCol)).as("n"),
        countDistinct(col(idCol)).as("d")).head()
      require(r.getLong(0) == r.getLong(1),
        s"corpusShuffle: $idCol is not unique (${r.getLong(0)} rows, " +
          s"${r.getLong(1)} distinct) — positions would be " +
          "partitioning-dependent; dedup before shuffling")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol))
      .orderBy(col("_skey"), col(idCol))
    df.withColumn(shardCol, deterministicFold(col(idCol), shards))
      .withColumn("_skey", md5(col(idCol).cast("string")))
      .withColumn(posCol, row_number().over(w).cast("long") - 1)
      .drop("_skey")
  }
}
