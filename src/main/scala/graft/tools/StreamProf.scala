package graft.tools

import org.apache.spark.sql.SparkSession

/** r14 streaming-store drift study: q111/q113 minima rose two rounds
  * running (2.8→3.5 s, 4.8→6.3 s across r12→r13 round artifacts) — the
  * only family with a consistent direction. Those artifacts came from
  * SEPARATE processes on different box states, so per the bench-noise
  * discipline no cross-round claim stands without interleaved same-JVM
  * minima. This probe takes N alternating draws of the two gate bodies
  * in ONE JVM (fresh state/checkpoint dirs per draw — each draw pays
  * the full 3-micro-batch store lifecycle; the chunk input dirs are
  * cached after draw 1, exactly as in the bench), prints every draw and
  * the minima. Read-out: minima near the r12 numbers ⇒ the round drift
  * was co-tenant attribution error (close the item); minima near r13 ⇒
  * real per-batch cost growth to bisect (store layout? robustness
  * counts?).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.StreamProf [reps]
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets = Seq("q111_streaming_incr_dedup", "q113_streaming_semdedup")
    // warm pass (unbilled): codegen + chunk-cache fill, as in the bench
    targets.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).count()
    }
    val draws = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { r =>
      targets.foreach { n =>
        spark.sparkContext.setJobDescription(s"streamprof $n rep $r")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        draws(n) = draws(n) :+ dt
        println(f"""{"probe":"streamprof","query":"$n","rep":$r,"sec":$dt%.3f}""")
        System.gc()
      }
    }
    targets.foreach { n =>
      println(f"""{"probe":"streamprof_min","query":"$n","min_sec":${draws(n).min}%.3f,"draws":${draws(n).map(d => f"$d%.3f").mkString("[", ",", "]")}}""")
    }
    spark.stop()
  }
}
