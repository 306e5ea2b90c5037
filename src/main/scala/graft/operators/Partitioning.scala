package graft.operators

import org.apache.spark.sql.DataFrame

/** Partition-health helpers shared by the CPU-heavy operators. */
object Partitioning {

  /** Spread a narrow upstream over the session's default parallelism.
    *
    * A small parquet file scans as ONE split, which would serialize every
    * downstream CPU-heavy projection (tokenize/shingle/fingerprint/dot-
    * product) onto a single core until the first shuffle; one cheap
    * round-robin shuffle of the raw rows unlocks every core first. No-op
    * when the input is already at least as wide as the session default
    * (the cluster-scale case — big scans arrive with hundreds of splits,
    * and repartitioning those would be a harmful extra shuffle).
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
