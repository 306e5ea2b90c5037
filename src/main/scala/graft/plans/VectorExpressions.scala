package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for dense-vector math.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, *))`)
  * is correct but allocates an intermediate array per row-pair and walks it
  * again to reduce — in ANN joins that code runs once per CANDIDATE PAIR,
  * the hottest loop in the engine. These expressions generate a single
  * fused loop over the two `ArrayData` (no allocation, stays inside
  * whole-stage codegen), with an interpreted `nullSafeEval` fallback.
  *
  * Accumulation is sequential left-to-right, matching both the
  * higher-order-function formulation and DuckDB's `list_inner_product` —
  * oracle hash-parity is preserved bit-for-bit.
  */
object VectorExpressions {

  /** Σ aᵢ·bᵢ as one codegen'd loop. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  /** Σ (aᵢ−bᵢ)² as one codegen'd loop. */
  def l2sq(a: Column, b: Column): Column =
    ExpressionUtils.column(L2SquaredDistance(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))
}

abstract class VectorFoldExpression extends BinaryExpression
    with Serializable {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  /** Scalar combine step (interpreted path). */
  protected def combine(x: Double, y: Double): Double
  /** Java source for the combine step over the given element variables. */
  protected def combineCode(xi: String, yi: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += combine(x.getDouble(i), y.getDouble(i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName every local: when inputs are non-nullable this body is
      // spliced into the enclosing method scope, and raw `n`/`i` collide
      // with a sibling kernel's locals (Janino redefinition → the whole
      // stage silently falls back to interpreted eval).
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.getDouble($i);
         |  double $yi = $y.getDouble($i);
         |  $acc += ${combineCode(xi, yi)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Dot product over two double arrays (elements assumed non-null —
  * embedding columns; a null ELEMENT would read as 0.0).
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineCode(xi: String, yi: String): String =
    s"$xi * $yi"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** Squared L2 distance over two double arrays. */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double =
    (x - y) * (x - y)
  override protected def combineCode(xi: String, yi: String): String =
    s"($xi - $yi) * ($xi - $yi)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_l2sq"
}
