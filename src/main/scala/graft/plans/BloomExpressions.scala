package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for broadcast-Bloom n-gram decontamination.
  *
  * [[graft.operators.Curation.contaminationReport]] probes the benchmark
  * gram set with an explode → broadcast-join → per-doc groupBy: correct
  * and gram-exact, but the corpus side still pays an explode (one row per
  * gram) and a per-doc aggregation shuffle. At 100 TB the train corpus is
  * the thing you must NOT expand or shuffle; the benchmark side is small
  * by construction. The Bloom form collapses the whole probe into one
  * map-only projection: the benchmark's grams are folded DISTRIBUTED into
  * an `mBits`-wide bit array (a `bit_or` rollup over word indexes — the
  * driver only ever sees mBits/64 longs, 32 KB at 2^18 up to 16 MB at a
  * production 2^27), and each corpus document then tests its own distinct
  * grams against that array inside whole-stage codegen — k bit tests per
  * gram, zero explode, zero join, zero shuffle.
  *
  * Classic Bloom semantics: NO false negatives (every gram the exact probe
  * would hit sets all k of its bits by construction), false positives at
  * rate ≈ (1 − e^(−k·g/m))^k for g benchmark grams — so the flagged set is
  * a SUPERSET of the exact report's at equal threshold, and the operator
  * is a pre-filter: route only flagged documents (a small fraction at
  * sane m) into the exact gram join when exact overlap ratios are needed.
  *
  * Oracle determinism: positions are the repo's md5-60-bit idiom (the
  * q137 lineage) — `md5(gram || '#' || i)`, first 15 hex chars as a
  * 60-bit integer, mod mBits. MD5 is bit-identical across the JVM
  * (`MessageDigest`), Spark's `md5()`, and DuckDB's `md5()`, so a DuckDB
  * oracle replays the EXACT bit array — false positives and all — by
  * joining gram positions against the distinct set-bit table (membership
  * in the distinct-position set is equivalent to testing the bit array).
  * Tokenization is ShingleKernel parity: `trim` then java-regex `\s+`,
  * the split DuckDB's `string_split_regex(trim(text), '\s+')` mirrors
  * (q79-proven).
  */
object BloomKernel {

  private val Ws = Pattern.compile("\\s+")

  /** md5-60-bit position of `gram`'s i-th probe: first 8 digest bytes as
    * an unsigned big-endian long, >>> 4 (= the first 15 hex chars as a
    * 60-bit value — `conv(substring(md5(s),1,15),16,10)` in Spark SQL,
    * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` in DuckDB),
    * mod `mBits`. Nonnegative by construction.
    */
  def position(md: MessageDigest, gram: String, i: Int, mBits: Int): Long = {
    val d = md.digest((gram + "#" + i).getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    (v >>> 4) % mBits
  }

  /** Distinct word n-grams of `text` under ShingleKernel tokenization
    * (Spark parity: ASCII-space trim, java-regex `\s+` split, limit -1).
    * Insertion-ordered; empty when the document has fewer than n tokens.
    */
  private def distinctGrams(text: UTF8String, n: Int):
      java.util.LinkedHashSet[String] = {
    val grams = new java.util.LinkedHashSet[String]()
    val toks = Ws.split(text.trim().toString, -1)
    if (toks.length < n) return grams
    val m = toks.length - n + 1
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      grams.add(sb.toString)
      i += 1
    }
    grams
  }

  /** BUILD side: all k probe positions of every distinct word n-gram of
    * `text` — k × |distinct grams| longs, duplicates possible (bit_or is
    * idempotent downstream, so they are not deduped here).
    */
  def gramPositions(text: UTF8String, n: Int, k: Int,
                    mBits: Int): ArrayData = {
    val grams = distinctGrams(text, n)
    val out = new Array[Long](grams.size * k)
    val md = MessageDigest.getInstance("MD5")
    var w = 0
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next()
      var i = 0
      while (i < k) { out(w) = position(md, g, i, mBits); w += 1; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** PROBE side: `[n_shingles, n_bloom_hits]` for `text` against the
    * benchmark's bit array — a gram hits iff ALL k of its bits are set.
    * One linear pass per document, no allocation beyond the gram set.
    */
  def probe(text: UTF8String, n: Int, k: Int, mBits: Int,
            bits: Array[Long]): ArrayData = {
    val grams = distinctGrams(text, n)
    val md = MessageDigest.getInstance("MD5")
    var hits = 0
    val it = grams.iterator()
    while (it.hasNext) {
      val g = it.next()
      var allSet = true
      var i = 0
      while (allSet && i < k) {
        val pos = position(md, g, i, mBits)
        allSet = ((bits((pos >>> 6).toInt) >>> (pos & 63L).toInt) & 1L) == 1L
        i += 1
      }
      if (allSet) hits += 1
    }
    new GenericArrayData(Array(grams.size, hits))
  }
}

/** BUILD-side expression: the k md5-60-bit Bloom positions of every
  * distinct word n-gram of a string column ([[BloomKernel.gramPositions]]).
  * Exploded and `bit_or`-rolled into mBits/64 words by
  * [[graft.operators.Curation.bloomContaminationBits]] — the driver never
  * sees gram strings or positions, only the finished word array.
  */
case class BloomGramPositions(child: Expression, n: Int, k: Int, mBits: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 || k < 1 || mBits < 64 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, k >= 1, mBits >= 64")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    BloomKernel.gramPositions(t.asInstanceOf[UTF8String], n, k, mBits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BloomKernel.gramPositions($c, $n, $k, $mBits);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"bloom_gram_positions$n"
}

/** PROBE-side expression: `[n_shingles, n_bloom_hits]` of a string column
  * against a benchmark Bloom bit array ([[BloomKernel.probe]]). The bit
  * array rides the expression as a plan reference (`addReferenceObj`) —
  * it ships once per task closure like a broadcast, and the generated
  * code is a one-line static call, so the whole probe stays inside
  * whole-stage codegen with zero join and zero shuffle.
  */
case class BloomNgramProbe(child: Expression, n: Int, k: Int, mBits: Int,
                           bits: Array[Long])
    extends UnaryExpression with Serializable {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 || k < 1 || mBits < 64 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, k >= 1, mBits >= 64")
    case _ if bits.length != mBits / 64 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bits.length == mBits/64")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    BloomKernel.probe(t.asInstanceOf[UTF8String], n, k, mBits, bits)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      s"${ev.value} = graft.plans.BloomKernel.probe($c, $n, $k, $mBits, $bitsRef);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"bloom_ngram_probe$n"
}
