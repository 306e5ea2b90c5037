package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JVM/codegen/scheduler init shouldn't bill the first query.
    // Tables.load (not raw parquet read) — events is TIMESTAMP(NANOS) and
    // needs the nanosAsLong path or the warm-up count itself aborts a job.
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.count()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $n failed: $e")
      }
    }
    // pass 1 (unbilled): run every query once to compile its generated
    // code (Janino) + JIT the hot loops — q25 measured 7.1s cold vs 1.0s
    // warm, i.e. ~85% one-time compilation, which is noise at cluster
    // scale. Then DROP all caches: queries that .cache() internally must
    // redo their real data work (tokenize/shuffle/join) in the timed pass
    // — only the codegen cache (keyed on generated source) carries over.
    if (sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0") {
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            // a swallowed failure must be visible in the metric line —
            // a silently-timed aborted job reads as a (fast) success
            errors ::= name -> e.toString.take(200)
            e.printStackTrace(System.err)
        }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val errJson = errors.reverse
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
