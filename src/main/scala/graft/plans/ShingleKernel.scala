package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram shingle hashing — the scalar kernel behind
  * [[HashedWordShingles]].
  *
  * Exactly reproduces the Column-algebra formulation
  * `array_sort(array_distinct(transform(shinglesOfTokens(split(trim(text),
  * "\\s+"), n), s => xxhash64(s))))` (same tokens, same gram bytes, same
  * XXH64 seed 42), but as ONE linear pass per document instead of a
  * four-level lambda tree.
  *
  * Why this exists: Catalyst freely COPIES expressions — filter pushdown
  * and `InferFiltersFromGenerate` duplicated the lambda formulation into a
  * non-codegen Filter below the token-materializing Project, where the
  * inlined `split()` re-ran at every `element_at` site (measured: q79's
  * explode stage at 10s for 5k docs, interpreted). A copied
  * HashedWordShingles costs one linear pass wherever it lands, and its
  * generated code is a one-line static call — no lambda variables, so the
  * codegen cache key is stable across plan instantiations.
  */
object ShingleKernel {

  private val Ws = Pattern.compile("\\s+")

  /** Sorted distinct xxhash64(seed 42) hashes of the word n-grams of
    * `text`. Empty array when the document has fewer than n tokens
    * (including the `[""]` single-token result of empty/blank text, which
    * mirrors `split(trim(''), "\\s+")`).
    */
  def hashedWordShingles(text: UTF8String, n: Int): ArrayData = {
    val hs = gramHashes(text, n)
    val m = hs.length
    if (m == 0) return new GenericArrayData(hs)
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted hashes
    var w = 1
    var i = 1
    while (i < m) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == m) hs else java.util.Arrays.copyOf(hs, w))
  }

  /** xxhash64(seed 42) hashes of the word n-grams of `text`, one per gram
    * IN DOCUMENT ORDER (no sort, no dedup) — the positional form repeated-
    * substring detection explodes ([[PositionalWordShingles]]).
    */
  def positionalWordShingles(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(gramHashes(text, n))

  /** One linear pass: hash every word n-gram of `text` in order. */
  private def gramHashes(text: UTF8String, n: Int): Array[Long] = {
    // Spark parity: trim() strips ASCII spaces only (StringTrim), then
    // java.util.regex "\s+" with limit -1 (StringSplit)
    val toks = Ws.split(text.trim().toString, -1)
    if (toks.length < n) return Array.emptyLongArray
    val m = toks.length - n + 1
    val hs = new Array[Long](m)
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
      val b = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    hs
  }
}
