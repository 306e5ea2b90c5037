package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-normalization expressions.
  *
  * Multilingual corpora mix Unicode normalization forms: "é" arrives both
  * precomposed (U+00E9, NFC) and decomposed (U+0065 U+0301, NFD) — equal
  * to a reader, different bytes to every hash. Without normalization,
  * every digest-based operator in the engine (exact dedup, shingle/
  * MinHash/SimHash near-dup, contamination probes, vocabulary induction)
  * silently treats the two as distinct, weakening dedup exactly on the
  * multilingual slices where it matters most. Normalize ONCE at ingest —
  * the canonical pipeline position — and every downstream hash agrees.
  */
object TextExpressions {

  /** Unicode canonical composition (NFC) of a string column. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}

/** JVM kernel for [[NfcNormalize]] — object methods get static forwarders,
  * so generated code calls `graft.plans.TextKernel.nfc(...)` directly.
  */
object TextKernel {

  /** NFC-normalize; returns the INPUT UTF8String unchanged when the text
    * is already normalized (the overwhelmingly common case — ASCII short-
    * circuits inside `Normalizer.isNormalized`), so the hot path does no
    * string conversion or allocation at all.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a codegen'd unary expression — see
  * [[TextExpressions]] for why this runs at ingest. A Scala UDF would do
  * the same work but break whole-stage codegen for the surrounding
  * projection; this stays inside the generated plan.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    TextKernel.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernel.nfc($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
