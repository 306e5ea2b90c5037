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
  *    EARLIEST piece boundaries (the lexicographically smallest
  *    boundary-position list). The DP tracks boundary-index arrays
  *    directly — integer comparisons, no joined strings — so the
  *    tie-break is collation-free and survives ANY input alphabet,
  *    including words that contain control characters. Boundary order
  *    is prefix-decomposable, so the O(n·maxPieceLen) DP selects
  *    exactly the path a full enumeration would. (The q152 DuckDB
  *    oracle replays the same rule as `path ASC` under a chr(31)
  *    joiner — equivalent to boundary order whenever corpus characters
  *    are >= U+0020, which the gated corpus satisfies; the joiner
  *    limit is now oracle-side only, not a kernel defect.)
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

  /** True iff the candidate boundary list (`base` extended by `lastB`)
    * sorts strictly before `cur`. Only called under a piece-count tie,
    * so both lists have the same length (`base.length + 1`).
    */
  private def earlierBoundaries(base: Array[Int], lastB: Int,
                                cur: Array[Int]): Boolean = {
    val m = cur.length
    if (m == 0) return false
    var k = 0
    while (k < m - 1) {
      if (base(k) != cur(k)) return base(k) < cur(k)
      k += 1
    }
    lastB < cur(m - 1)
  }

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
    // bnd(i): the best segmentation of symbols [0, i) as its INTERIOR
    // piece-boundary positions (excludes 0 and i) — np(i) - 1 entries
    val bnd = new Array[Array[Int]](n + 1)
    score(0) = 0.0
    bnd(0) = Array.emptyIntArray
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
            if (s > score(i) || (s == score(i) &&
                (c < np(i) || (c == np(i) &&
                  earlierBoundaries(bnd(j), j, bnd(i)))))) {
              score(i) = s; np(i) = c
              bnd(i) =
                if (j == 0) Array.emptyIntArray
                else {
                  val a = java.util.Arrays.copyOf(bnd(j), c - 1)
                  a(c - 2) = j
                  a
                }
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
      else {
        val b = bnd(n)
        Array.tabulate(b.length + 1) { k =>
          val from = if (k == 0) 0 else b(k - 1)
          val to = if (k == b.length) n else b(k)
          w.substring(starts(from), starts(to))
        }
      }
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
