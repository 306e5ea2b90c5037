package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Packed random-hyperplane signature — the sign bits of `planes.size`
  * Gaussian projections, packed little-endian into ceil(bits/64) longs.
  *
  * This is the SKETCH side of signature-prefiltered cosine near-dup
  * ([[graft.operators.Similarity.cosineNearDupPairsAuto]]'s scale arm):
  * by Goemans–Williamson, two vectors at angle θ disagree on each sign
  * bit independently with probability θ/π, so the Hamming distance
  * between two signatures is Binomial(bits, θ/π) — an unbiased, sharply
  * concentrated angle estimate that costs xor+popcount per candidate
  * instead of a d-dimensional float dot product, and 8·ceil(bits/64)
  * bytes per row in the candidate exchange instead of the vector.
  *
  * One kernel pass per row (flattened plane matrix in a reference
  * object, tight loop, no per-plane Catalyst expressions — 256 planes
  * as Column algebra would be 256 aggregate() trees).
  */
final class RhpPackKernel(planes: Seq[Seq[Double]]) extends Serializable {
  require(planes.nonEmpty, "planes must be non-empty")
  private val bits = planes.size
  private val dim = planes.head.size
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](bits * dim)
    var i = 0
    planes.foreach { p =>
      require(p.size == dim, "ragged plane matrix")
      p.foreach { x => a(i) = x; i += 1 }
    }
    a
  }

  def nLongs: Int = (bits + 63) >>> 6

  def pack(v: ArrayData): GenericArrayData = {
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nLongs)
    var b = 0
    while (b < bits) {
      var acc = 0.0
      val off = b * dim
      var j = 0
      while (j < n) { acc += flat(off + j) * v.getDouble(j); j += 1 }
      if (acc >= 0.0) out(b >>> 6) |= (1L << (b & 63))
      b += 1
    }
    new GenericArrayData(out.map(java.lang.Long.valueOf(_): Any))
  }
}

/** ArrayType(DoubleType) → ArrayType(LongType) unary kernel wrapper;
  * `planes` is the structural-equality field, the flattened matrix a
  * transient lazy — the [[UnigramSegment]] pattern.
  */
case class RhpPack(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rhp_pack"

  @transient private lazy val kernel = new RhpPackKernel(planes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    kernel.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("rhp", kernel,
        classOf[RhpPackKernel].getName)
      s"${ev.value} = $ref.pack($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RhpPack = copy(child = newChild)
}

/** All-tables RHP bucket assignment in ONE kernel pass: element t of the
  * output is table t's bucket id — bit i set iff the vector's projection
  * on plane i of table t is ≥ 0, the exact per-bit convention of
  * [[graft.functions.VectorFunctions.rhpBucket]] (same left-to-right
  * accumulation order, same `>= 0.0` sign rule), so the bucket VALUES
  * are unchanged and every oracle stays pinned.
  *
  * Why a kernel: the Column-algebra form builds |tables|·|bits|
  * aggregate(zip_with(...)) trees with the plane rows inlined as
  * literals — at the routed surface's 44-table geometry that is a
  * multi-thousand-node plan whose ANALYSIS cost alone dominated q149
  * (measured ~2.6 s driver time per call at sf0.1), and the
  * higher-order functions allocate a zipped array per plane per row at
  * execution. Here the whole matrix rides one reference object
  * (O(1) plan size) and evaluation is a fused multiply-add loop.
  */
final class RhpBucketsKernel(tables: Seq[Seq[Seq[Double]]])
    extends Serializable {
  require(tables.nonEmpty, "tables must be non-empty")
  private val nTables = tables.size
  private val bits = tables.head.size
  private val dim = tables.head.head.size
  require(bits >= 1 && bits <= 63, s"bits per table must be in [1,63], got $bits")
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nTables * bits * dim)
    var i = 0
    tables.foreach { planes =>
      require(planes.size == bits, "ragged table list")
      planes.foreach { p =>
        require(p.size == dim, "ragged plane matrix")
        p.foreach { x => a(i) = x; i += 1 }
      }
    }
    a
  }

  def buckets(v: ArrayData): GenericArrayData = {
    // exact-dim contract (r17, the r16 advice item): a short or long
    // vector would silently zero-pad/truncate the projection — and the
    // old per-plane Column form null-padded to bucket 0 instead — so a
    // dim mismatch is a caller bug that must fail loudly, not a value
    // difference between the two forms
    require(v.numElements() == dim,
      s"rhp_buckets: vector has ${v.numElements()} elements, planes " +
        s"have $dim — RHP requires exact-dimension vectors")
    val n = dim
    val out = new Array[Any](nTables)
    val m = flat
    var t = 0
    while (t < nTables) {
      var bkt = 0L
      var b = 0
      while (b < bits) {
        var acc = 0.0
        val off = (t * bits + b) * dim
        var j = 0
        while (j < n) { acc += m(off + j) * v.getDouble(j); j += 1 }
        if (acc >= 0.0) bkt |= (1L << b)
        b += 1
      }
      out(t) = bkt
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** ArrayType(DoubleType) → ArrayType(LongType) wrapper for
  * [[RhpBucketsKernel]] — the [[RhpPack]] pattern.
  *
  * Element contract: vectors must be exact-dimension (enforced — see
  * the kernel's require) with NO null elements (not enforced in the
  * fused loop for cost; every caller feeds parquet/literal embeddings
  * that are dense by construction). NULL vectors are null-out
  * (nullSafeEval), and `posexplode` over the result then DROPS the row
  * — callers that must keep null-embedding rows filter them upstream
  * deliberately rather than relying on join-side behavior.
  */
case class RhpBuckets(child: Expression, tables: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rhp_buckets"

  @transient private lazy val kernel = new RhpBucketsKernel(tables)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    kernel.buckets(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("rhpb", kernel,
        classOf[RhpBucketsKernel].getName)
      s"${ev.value} = $ref.buckets($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RhpBuckets = copy(child = newChild)
}

object RhpExpressions {

  /** Packed RHP signature of an `array<double>` vector column — O(1)
    * plan size in |planes| (the matrix rides a reference object).
    */
  def rhpPack(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(RhpPack(ColumnBridge.expression(vec), planes))

  /** Per-table RHP bucket ids of an `array<double>` vector column as
    * one `array<long>` (element t = table t's bucket) — O(1) plan size
    * in |tables|·|bits|; values identical to the per-plane Column form.
    */
  def rhpBuckets(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(RhpBuckets(ColumnBridge.expression(vec), tables))
}
