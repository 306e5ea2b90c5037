package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram piece LM — the E-step kernel of
  * SentencePiece-style (Kudo 2018) unigram tokenizer learning, and the
  * encode kernel once the model is trained.
  *
  * Semantics (replayed closed-form by the q152 DuckDB oracle, so every
  * rule here is deliberate):
  *
  *  - symbols are Unicode CODE POINTS (`substr` semantics on both
  *    engines — a surrogate pair is one symbol);
  *  - a segmentation is a cover of the word by vocabulary pieces of at
  *    most `maxPieceLen` code points; its score is the LEFT-ASSOCIATIVE
  *    sum of piece log-probs in path order (bit-reproducible against
  *    any engine folding the same doubles in the same order);
  *  - best = max score, ties to FEWER pieces, remaining ties to the
  *    lexicographically smallest piece list under a U+001F joiner.
  *    Because every segmentation covers the same characters, comparing
  *    joined strings equals comparing boundary positions (the separator
  *    sorts below the corpus alphabet), which is prefix-decomposable —
  *    so the O(n·maxPieceLen) DP below selects exactly the path a full
  *    enumeration would. (Tie-break comparison is by UTF-16 `compareTo`;
  *    identical to UTF-8 byte order on BMP text, which is the gated
  *    corpus — documented limit, not a silent one.)
  *  - a word with a character absent from the vocabulary falls back to
  *    its raw code points (never fails; callers guarantee coverage by
  *    always keeping single-character pieces).
  */
final class UnigramViterbiKernel(pieces: Seq[(String, Double)],
                                 maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")

  @transient private lazy val logp = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  private val Sep = '\u001f'

  def segment(wU: UTF8String): GenericArrayData = {
    val w = wU.toString
    // code-point symbol boundaries
    val starts = {
      val b = new scala.collection.mutable.ArrayBuffer[Int](w.length + 1)
      var ci = 0
      while (ci < w.length) { b += ci; ci += Character.charCount(w.codePointAt(ci)) }
      b += w.length
      b.toArray
    }
    val n = starts.length - 1
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val np = new Array[Int](n + 1)
    val path = new Array[String](n + 1)
    score(0) = 0.0
    path(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, i)) {
        val j = i - l
        if (score(j) != Double.NegativeInfinity) {
          val piece = w.substring(starts(j), starts(i))
          val lp = logp.get(piece)
          if (lp != null) {
            val s = score(j) + lp.doubleValue()
            val c = np(j) + 1
            val jo = if (j == 0) piece else path(j) + Sep + piece
            if (s > score(i) || (s == score(i) &&
                (c < np(i) || (c == np(i) && jo.compareTo(path(i)) < 0)))) {
              score(i) = s; np(i) = c; path(i) = jo
            }
          }
        }
        l += 1
      }
      i += 1
    }
    val out: Array[String] =
      if (score(n) == Double.NegativeInfinity) {
        // coverage fallback: raw code points
        Array.tabulate(n)(k => w.substring(starts(k), starts(k + 1)))
      } else if (n == 0) Array.empty
      else path(n).split(Sep)
    new GenericArrayData(out.map(UTF8String.fromString(_): Any))
  }
}

/** StringType → ArrayType(StringType) unary kernel wrapper; `pieces` is
  * the structural-equality field, the compiled hash map a transient
  * lazy — the [[BpeSegment]] pattern.
  */
case class UnigramSegment(child: Expression, pieces: Seq[(String, Double)],
                          maxPieceLen: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unigram_segment"

  @transient private lazy val kernel =
    new UnigramViterbiKernel(pieces, maxPieceLen)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(w: Any): Any =
    kernel.segment(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("unigram", kernel,
        classOf[UnigramViterbiKernel].getName)
      s"${ev.value} = $ref.segment($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnigramSegment = copy(child = newChild)
}

object UnigramExpressions {

  /** Viterbi segmentation of a word column under a unigram piece LM —
    * O(1) plan size in |pieces| (the model rides a reference object,
    * not the expression tree).
    */
  def unigramSegment(word: Column, pieces: Seq[(String, Double)],
                     maxPieceLen: Int): Column =
    ColumnBridge.column(
      UnigramSegment(ColumnBridge.expression(word), pieces, maxPieceLen))
}
