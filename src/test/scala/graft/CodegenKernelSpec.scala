package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.{CentroidExpressions, SetExpressions, VectorExpressions}

/** Regression guard for the raw-local codegen collision (round-5 verdict):
  * when inputs are NON-nullable, `nullSafeCodeGen` splices a kernel body
  * straight into the enclosing method scope, so two kernels in one
  * collapsed projection redeclared `i`/`n`/... and Janino rejected the
  * projection — Spark then silently fell back to interpreted eval
  * ("Expr codegen error and falling back to interpreter mode", 36 events
  * in the round-5 test log). Every generated local now goes through
  * `ctx.freshName`.
  *
  * The test composes ALL custom kernels in ONE projection over columns
  * whose nullability is provably false, with
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` and
  * `spark.sql.codegen.fallback=false` — any codegen failure THROWS here
  * instead of degrading, and values must equal the interpreted
  * (`NO_CODEGEN`) run bit-for-bit.
  */
class CodegenKernelSpec extends SparkSpec {

  private def withFactoryMode[T](mode: String)(f: => T): T = {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFall = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f
    finally {
      prevMode match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      prevFall match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }

  /** Inputs built purely from non-nullable sources (range id + literals)
    * so every kernel's null-check block is elided and the bodies land in
    * one shared method scope — the collision-prone shape.
    */
  private def inputs: DataFrame =
    spark.range(1, 41).toDF("id").select(
      col("id"),
      array_sort(array_distinct(split(concat_ws(" ",
        lit("alpha beta gamma"), col("id").cast("string")), " "))).as("sa"),
      array_sort(array_distinct(split(concat_ws(" ",
        lit("beta gamma delta"), col("id").cast("string")), " "))).as("sb"),
      sort_array(array(col("id"), col("id") + 5L, col("id") + 9L)).as("la"),
      sort_array(array(col("id") + 5L, col("id") + 7L)).as("lb"),
      split(lit("t1 t2 t3 t4 t5"), " ").as("toks"),
      array(lit(2L), lit(4L)).as("cov"),
      array(col("id").cast("double"), lit(2.0), lit(3.0)).as("va"),
      array(lit(1.5), col("id").cast("double"), lit(0.5)).as("vb"),
      array(array(col("id").cast("double"), lit(2.0)),
        array(lit(1.0), lit(3.0))).as("lut"),
      array(lit(1L), lit(2L)).as("codes"))

  /** Tiny centroid/codebook models for the centroid-scan kernels. */
  private val testCentroids =
    Seq(Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0, 0.0), Seq(5.0, 5.0, 5.0))
  private val testCodebooks = // 3 subspaces of width 1, 2 sub-centroids
    Seq.fill(3)(Seq(Seq(0.5), Seq(2.5)))

  /** Every custom kernel, composed in a single projection. */
  private def allKernels(df: DataFrame): DataFrame =
    df.select(
      col("id"),
      SetExpressions.sortedIntersectCount(col("sa"), col("sb")).as("k1"),
      SetExpressions.sortedLongIntersectCount(col("la"), col("lb")).as("k2"),
      SetExpressions.minHash(col("sa"), 4).as("k3"),
      SetExpressions.minHashLongs(col("la"), 4).as("k4"),
      SetExpressions.joinTokensExceptSorted(col("toks"), col("cov")).as("k5"),
      SetExpressions.sortedLastLeq(col("la"), col("id") + 6L).as("k6"),
      VectorExpressions.dot(col("va"), col("vb")).as("k7"),
      VectorExpressions.l2sq(col("va"), col("vb")).as("k8"),
      CentroidExpressions.nearestCentroid(col("va"), testCentroids)
        .as("k9"),
      CentroidExpressions.minCentroidDist(col("va"), testCentroids)
        .as("k10"),
      CentroidExpressions.pqCodes(col("va"), testCodebooks).as("k11"),
      CentroidExpressions.pqAdc(col("lut"), col("codes")).as("k12"))

  test("kernel inputs are genuinely non-nullable (the collision shape)") {
    val bad = inputs.schema.fields.filter(_.nullable).map(_.name)
    assert(bad.isEmpty, s"test premise broken — nullable inputs: ${bad.toSeq}")
  }

  test("all kernels compose in one projection under CODEGEN_ONLY") {
    val rows = withFactoryMode("CODEGEN_ONLY") {
      allKernels(inputs).collect()
    }
    assert(rows.length == 40)
  }

  test("codegen and interpreted eval agree bit-for-bit") {
    val gen = withFactoryMode("CODEGEN_ONLY") {
      allKernels(inputs).orderBy("id").collect().toSeq
    }
    val interp = withFactoryMode("NO_CODEGEN") {
      allKernels(inputs).orderBy("id").collect().toSeq
    }
    assert(gen == interp)
  }

  test("kernels compile in the UnsafeProjection context too " +
    "(whole-stage disabled)") {
    // The Arrays.copyOf/Janino-generics failure only surfaced in
    // GenerateUnsafeProjection (a ProjectExec outside whole-stage —
    // the shape every post-aggregate projection takes), which the
    // whole-stage tests above never compile. Force that context.
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val rows = withFactoryMode("CODEGEN_ONLY") {
        allKernels(inputs).orderBy("id").collect().toSeq
      }
      val interp = withFactoryMode("NO_CODEGEN") {
        allKernels(inputs).orderBy("id").collect().toSeq
      }
      assert(rows == interp && rows.length == 40)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("kernel pairs survive CODEGEN_ONLY in every 2-combination") {
    // The round-5 failure needed just two kernels sharing a scope; cover
    // each pair so a future raw local in any ONE kernel fails loudly.
    val ks: Seq[DataFrame => org.apache.spark.sql.Column] = Seq(
      d => SetExpressions.sortedIntersectCount(d("sa"), d("sb")),
      d => SetExpressions.sortedLongIntersectCount(d("la"), d("lb")),
      d => SetExpressions.minHash(d("sa"), 4),
      d => SetExpressions.minHashLongs(d("la"), 4),
      d => SetExpressions.joinTokensExceptSorted(d("toks"), d("cov")),
      d => SetExpressions.sortedLastLeq(d("la"), d("id") + 6L),
      d => VectorExpressions.dot(d("va"), d("vb")),
      d => VectorExpressions.l2sq(d("va"), d("vb")),
      d => CentroidExpressions.nearestCentroid(d("va"), testCentroids),
      d => CentroidExpressions.minCentroidDist(d("va"), testCentroids),
      d => CentroidExpressions.pqCodes(d("va"), testCodebooks),
      d => CentroidExpressions.pqAdc(d("lut"), d("codes")))
    val df = inputs
    withFactoryMode("CODEGEN_ONLY") {
      for (i <- ks.indices; j <- ks.indices if i < j) {
        val n = df.select(ks(i)(df).as("a"), ks(j)(df).as("b")).count()
        assert(n == 40, s"pair ($i,$j)")
      }
    }
  }

  test("centroid-scan kernels are bit-equal to the HOF argmin forms on " +
    "real embeddings (the oracle-parity contract)") {
    import graft.functions.VectorFunctions.l2sq
    val cents = graft.queries.VectorQueries.centroidsForProfiling
    val cbs = graft.queries.VectorQueries.codebooksForProfiling
    val dsub = cbs.head.head.size
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val ctLit = typedLit(cents.map(_.toSeq))
    val cbLit = typedLit(cbs.map(_.map(_.toSeq)))
    val hofDists = transform(ctLit, ct => l2sq(col("v"), ct))
    val hofCodes = transform(sequence(lit(1), lit(cbs.size)), j => {
      val sub = slice(col("v"), (j - lit(1)) * lit(dsub) + lit(1), lit(dsub))
      val dists = transform(element_at(cbLit, j), cb => l2sq(sub, cb))
      array_position(dists, array_min(dists))
    })
    val both = emb.select(col("vec_id"),
      graft.plans.CentroidExpressions.nearestCentroid(col("v"), cents)
        .as("n_cell"),
      array_position(hofDists, array_min(hofDists)).as("h_cell"),
      graft.plans.CentroidExpressions.minCentroidDist(col("v"), cents)
        .as("n_d2"),
      array_min(hofDists).as("h_d2"),
      graft.plans.CentroidExpressions.pqCodes(col("v"), cbs).as("n_codes"),
      hofCodes.as("h_codes"))
    val diverged = both.filter(
      col("n_cell") =!= col("h_cell") || col("n_d2") =!= col("h_d2") ||
        col("n_codes") =!= col("h_codes"))
    assert(diverged.count() == 0,
      s"kernel/HOF divergence: ${diverged.take(3).mkString("; ")}")
    // ADC fold parity on the real lut/codes shapes
    val lutCol = transform(sequence(lit(1), lit(cbs.size)), j => {
      val sub = slice(col("v"), (j - lit(1)) * lit(dsub) + lit(1), lit(dsub))
      transform(element_at(cbLit, j), cb => l2sq(sub, cb))
    })
    val adcBoth = emb.select(
      graft.plans.CentroidExpressions.pqAdc(lutCol,
        graft.plans.CentroidExpressions.pqCodes(col("v"), cbs)).as("n_adc"),
      aggregate(sequence(lit(1), lit(cbs.size)), lit(0.0), (acc, j) =>
        acc + element_at(element_at(lutCol, j),
          element_at(hofCodes, j).cast("int"))).as("h_adc"))
    assert(adcBoth.filter(col("n_adc") =!= col("h_adc")).count() == 0)
  }
}
