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

object RhpExpressions {

  /** Packed RHP signature of an `array<double>` vector column — O(1)
    * plan size in |planes| (the matrix rides a reference object).
    */
  def rhpPack(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(RhpPack(ColumnBridge.expression(vec), planes))
}
