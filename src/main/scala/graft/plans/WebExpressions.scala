package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.WebCuration.PslRule

/** Native codegen'd kernel for public-suffix registrable-domain
  * extraction — the hot expression of the URL/domain curation family,
  * evaluated once per corpus row (and, when the domain becomes a
  * filter/join key, re-inlined below the projection by predicate
  * pushdown — the q105 lesson, so per-evaluation cost is what matters).
  *
  * Why this exists: the Column formulation (suffix candidates as
  * `when`-guarded split/slice/array_join columns probed against
  * `typedLit` maps, folded with `greatest`) is correct but ~116 µs/row —
  * the candidate subtrees are duplicated across ~18 probe sites with no
  * CSE and the map probes are linear scans. This kernel is ONE
  * right-to-left walk over the host bytes with O(1) hash probes:
  * measured ~0.2 µs/row, and the rule table scales to the full ~9k-rule
  * publicsuffix.org list unchanged (hash maps, not plan literals).
  *
  * Parity contract (pinned in WebCurationSpec against the Column twin):
  * identical output for every host, including the prevailing-rule order
  * (exception beats all; else longest match; else the default `*` rule),
  * the longest-exception tie-break, and NULL when the host IS a public
  * suffix.
  */
object WebExpressions {

  /** Registrable ("eTLD+1") domain of a host column (any case — the
    * kernel lowercases internally). */
  def registrableDomain(host: Column, psl: Seq[PslRule],
                        maxDepth: Int): Column =
    ExpressionUtils.column(RegistrableDomain(
      ExpressionUtils.expression(host), psl, maxDepth))

  /** RFC 3986 §6.2.2.2 percent-encoding normalization of a URI
    * component (see [[PctNormalizeKernel.normalize]]). */
  def pctNormalize(component: Column): Column =
    ExpressionUtils.column(PctNormalize(
      ExpressionUtils.expression(component)))

  /** IDN ToASCII of a host column (see [[IdnKernel.toAscii]]). */
  def idnToAscii(host: Column): Column =
    ExpressionUtils.column(IdnToAscii(ExpressionUtils.expression(host)))
}

/** IDN host normalization — the ToASCII subset a crawl-dedup key needs
  * (RFC 3490/5891): per dot-separated label, a label with any non-ASCII
  * code point is lowercased, NFC-normalized (the existing ingest
  * convention — [[TextKernel.nfc]]), punycode-encoded (RFC 3492 §6.3)
  * and prefixed `xn--`; pure-ASCII labels pass through byte-identical
  * (including existing `xn--` labels — idempotent). Without this,
  * `bücher.example` and `xn--bcher-kva.example` are distinct dedup keys
  * and distinct PSL-probe hosts — a silent under-merge on exactly the
  * multilingual crawl slices where URL dedup matters most.
  *
  * Deliberately NOT the full IDNA2008 protocol: no STD3 hyphen/length
  * validation, no bidi/contextual-rule rejection — a normalizer for
  * dedup keys must never throw on crawl garbage; invalid labels simply
  * encode deterministically. (Pinned against `java.net.IDN.toASCII` on
  * the NFC==NFKC alphabet in WebCurationSpec.)
  *
  * Stateless → static forwarder in codegen, the [[PctNormalizeKernel]]
  * pattern.
  */
object IdnKernel {
  private def digit(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def adapt(d: Long, numPoints: Int, first: Boolean): Int = {
    var delta = if (first) d / 700 else d / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((36 - 1) * 26) / 2) { delta /= (36 - 1); k += 36 }
    (k + (36 - 1 + 1) * delta / (delta + 38)).toInt
  }

  /** RFC 3492 §6.3 punycode encoding of one label's code points.
    *
    * delta/n/q are LONGs with a saturating clamp: RFC 3492 mandates
    * overflow handling, and crawl-garbage hosts can carry labels of
    * thousands of high code points where `(m - n) * (h + 1)` overflows
    * Int. Long arithmetic is exact for any label under ~8M code points
    * (far beyond any URL column); the clamp keeps pathological inputs
    * deterministic instead of emitting out-of-range digits.
    */
  private def punycode(cps: Array[Int]): String = {
    val out = new java.lang.StringBuilder
    var h = 0
    var i = 0
    while (i < cps.length) {
      if (cps(i) < 128) { out.append(cps(i).toChar); h += 1 }
      i += 1
    }
    val b = h
    if (b > 0) out.append('-')
    var n = 128L
    var delta = 0L
    var bias = 72
    val deltaCap = Long.MaxValue >> 2 // saturation: deterministic, never thrown
    while (h < cps.length) {
      var m = Int.MaxValue
      var j = 0
      while (j < cps.length) {
        if (cps(j) >= n && cps(j) < m) m = cps(j)
        j += 1
      }
      delta += (m - n) * (h + 1)
      if (delta < 0 || delta > deltaCap) delta = deltaCap
      n = m
      j = 0
      while (j < cps.length) {
        val c = cps(j)
        if (c < n) { delta += 1; if (delta > deltaCap) delta = deltaCap }
        else if (c == n) {
          var q = delta
          var k = 36
          var done = false
          while (!done) {
            val t = if (k <= bias) 1 else if (k >= bias + 26) 26
                    else k - bias
            if (q < t) done = true
            else {
              out.append(digit((t + (q - t) % (36 - t)).toInt))
              q = (q - t) / (36 - t)
              k += 36
            }
          }
          out.append(digit(q.toInt))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
        j += 1
      }
      delta += 1
      n += 1
    }
    out.toString
  }

  def toAscii(host: UTF8String): UTF8String = {
    // fast path: pure-ASCII hosts (the overwhelming majority) return
    // the input object untouched — no string conversion at all
    if (host.numBytes == 0) return host
    var allAscii = true
    val bytes = host.getBytes
    var bi = 0
    while (allAscii && bi < bytes.length) {
      if ((bytes(bi) & 0x80) != 0) allAscii = false
      bi += 1
    }
    if (allAscii) return host
    val s = host.toString
    val out = new java.lang.StringBuilder(s.length + 8)
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == '.') {
        val label = s.substring(start, i)
        if (label.forall(_ < 128)) out.append(label)
        else {
          val norm = java.text.Normalizer.normalize(
            label.toLowerCase(java.util.Locale.ROOT),
            java.text.Normalizer.Form.NFC)
          out.append("xn--").append(punycode(norm.codePoints.toArray))
        }
        if (i < s.length) out.append('.')
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(out.toString)
  }
}

/** StringType → StringType unary wrapper over [[IdnKernel.toAscii]]. */
case class IdnToAscii(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "idn_to_ascii"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    IdnKernel.toAscii(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.IdnKernel.toAscii($c);")

  override protected def withNewChildInternal(
      newChild: Expression): IdnToAscii = copy(child = newChild)
}

/** RFC 3986 §6.2.2.2 percent-encoding normalization: within each valid
  * `%XY` triplet, hex digits are uppercased, and triplets that encode an
  * UNRESERVED character (ALPHA / DIGIT / `-` / `.` / `_` / `~`) are
  * decoded to that character — `/a%2fb` ≡ `/a%2Fb` and `/x%41y` ≡
  * `/xAy`, the two equivalences a crawl-dedup key must honor or it
  * silently under-merges. Reserved characters stay ENCODED (decoding
  * `%2F` to `/` would change which bytes are path delimiters — §2.2).
  * A `%` not followed by two hex digits is copied verbatim (the input
  * is then not a valid URI; this normalizer never throws — the caller's
  * validity gate decides what is dead-lettered).
  *
  * Stateless, so codegen calls the static forwarder directly — no
  * reference object needed.
  */
object PctNormalizeKernel {
  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' ||
      c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  def normalize(in: UTF8String): UTF8String = {
    val s = in.toString
    if (s.indexOf('%') < 0) return in // fast path: nothing encoded
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && hexVal(s.charAt(i + 1)) >= 0 &&
          hexVal(s.charAt(i + 2)) >= 0) {
        val v = (hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else {
          sb.append('%')
          sb.append(Character.toUpperCase(s.charAt(i + 1)))
          sb.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** StringType → StringType unary wrapper over
  * [[PctNormalizeKernel.normalize]]. */
case class PctNormalize(child: Expression) extends UnaryExpression
    with Serializable {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pct_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    PctNormalizeKernel.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PctNormalizeKernel.normalize($c);")

  override protected def withNewChildInternal(
      newChild: Expression): PctNormalize = copy(child = newChild)
}

/** Executor-side compiled PSL rule set: three O(1)-probe hash
  * structures + the suffix walk. Kept as its own serializable class so
  * generated code can hold one reference object and call a plain
  * method.
  */
final class PslKernel(rules: Seq[PslRule], maxDepth: Int)
    extends Serializable {
  private val normal = new java.util.HashSet[String]
  private val wild = new java.util.HashSet[String]
  private val exc = new java.util.HashSet[String]
  rules.foreach { r =>
    if (r.isException) exc.add(r.name)
    else if (r.isWildcard) wild.add(r.name)
    else normal.add(r.name)
  }

  /** The publicsuffix.org algorithm over a host; null when nothing is
    * registered (host is itself a public suffix) or the input is empty.
    * Case-normalizes internally (one UTF8String lowercase per row —
    * cheap next to the walk): rule names are stored lowercase, so a
    * mixed-case host would otherwise miss every hash probe and SILENTLY
    * fall to the default `*` rule, returning a wrong eTLD+1. Callers
    * that already lowercased (urlHost) pay only the no-op scan.
    */
  def registrable(host: UTF8String): UTF8String = {
    val s = host.toLowerCase.toString
    if (s.isEmpty) return null
    // starts(i) = char offset where the suffix with the last i labels
    // begins; scanned up to maxDepth+1 (rules probe only the first
    // maxDepth — the +1 slot exists purely as the output start)
    val starts = new Array[Int](maxDepth + 2)
    var i = 0 // labels scanned so far
    var idx = s.length
    var bestNorm = 1 // default rule `*`: the last label
    var excPs = -1
    var prev: String = null
    var more = true
    while (more && i < maxDepth + 1) {
      val dot = s.lastIndexOf('.', idx - 1)
      i += 1
      starts(i) = dot + 1
      if (i <= maxDepth) {
        val cand = s.substring(dot + 1)
        if (exc.contains(cand)) excPs = i - 1 // longest exception wins
        if (i > bestNorm &&
            (normal.contains(cand) ||
              (prev != null && wild.contains(prev))))
          bestNorm = i
        prev = cand
      }
      if (dot < 0) more = false else idx = dot
    }
    val ps = if (excPs >= 0) excPs else bestNorm
    // registrable = last ps+1 labels; exists iff the host HAS that many
    // (ps+1 ≤ maxDepth+1, so the scan either recorded the start or the
    // host ran out of labels first)
    if (i >= ps + 1) UTF8String.fromString(s.substring(starts(ps + 1)))
    else null
  }
}

/** StringType → StringType unary kernel; `rules`/`maxDepth` are the
  * structural-equality fields (Catalyst canonicalization + CSE compare
  * by product members), the compiled kernel is a transient lazy.
  */
case class RegistrableDomain(child: Expression, rules: Seq[PslRule],
                             maxDepth: Int) extends UnaryExpression
    with Serializable {
  require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "registrable_domain"

  @transient private lazy val kernel = new PslKernel(rules, maxDepth)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def nullSafeEval(h: Any): Any =
    kernel.registrable(h.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("psl", kernel,
        classOf[PslKernel].getName)
      val out = ctx.freshName("domain")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $out =
         |  $ref.registrable($c);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RegistrableDomain = copy(child = newChild)
}
