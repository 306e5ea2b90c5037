package graft.operators

import org.apache.spark.network.util.JavaUtils
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
    *
    * Width is estimated from optimizer statistics (output size estimate /
    * scan split size), NOT from `df.rdd.getNumPartitions`: the RDD probe
    * forces physical planning of the subtree outside the AQE-managed run,
    * which is pure planning overhead on a cluster. Stats come from the
    * optimized logical plan — no physical plan, no RDD, no job. Relations
    * without real stats default to a huge size estimate, so the unknown
    * case safely degrades to "already wide → no-op".
    */
  def widen(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // r16: target the SESSION's shuffle width, not raw core count — the
    // two agree in every batch session (both sized to the cluster), but
    // a caller that has deliberately narrowed its shuffles (the
    // streaming gates run micro-batches at shuffle.partitions=3) was
    // still being widened to every core, so each per-batch action paid
    // defaultParallelism task launches on rows-per-task work. The
    // shuffle-partition conf is the one knob deployments already size
    // with the data; honor it here too.
    // NOTE (r16 advice): getOption returns the REGISTERED default
    // ("200") even when the user never set the conf, so the
    // defaultParallelism fallback below is effectively unreachable on a
    // stock session. That is accepted deliberately: every in-repo entry
    // point sizes the conf from SPARK_GRAFT_CPUS (so conf == cores), the
    // streaming gates NARROW it on purpose (widen must honor that), and
    // a library consumer who leaves it at 200 on a wider cluster is
    // under-widening dense kernels exactly as every shuffle in their job
    // is under-partitioned — the fix there is sizing the conf, the knob
    // deployments already own, not a second heuristic here.
    val target = spark.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val splitBytes = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")).max(1L)
    val estSplits = df.queryExecution.optimizedPlan.stats.sizeInBytes / splitBytes + 1
    if (estSplits < target) df.repartition(target) else df
  }
}
