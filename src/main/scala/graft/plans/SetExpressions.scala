package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * Near-dup verification evaluates set overlap once per CANDIDATE PAIR;
  * `size(array_intersect(a, b))` builds a hash set and an output array per
  * call. [[SortedIntersectCount]] exploits the invariant that shingle sets
  * are sorted+distinct (Dedup.shingleSets applies array_sort∘array_distinct)
  * and counts with a single allocation-free merge walk.
  *
  * [[MinHashArray]] computes a k-wide MinHash signature in ONE pass over
  * the shingle set using the Broder two-hash construction
  * h_i(x) = (h1(x) + i·h2(x)) mod P — versus k array traversals with a
  * fresh hash per (element, i) in the `array_min(transform(...))`
  * formulation.
  */
object SetExpressions {

  /** Smallest prime > 2^32 — the modulus of the double-hash family. */
  val MinHashP: Long = 4294967311L

  /** |a ∩ b| for two SORTED, DISTINCT string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** |a ∩ b| for two SORTED, DISTINCT long arrays (hashed shingles — the
    * scale representation: 8-byte fixed-width compares, no UTF8 walks).
    */
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** k-wide MinHash signature of a long array (hashed shingles). */
  def minHashLongs(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashLongArray(
      ColumnBridge.expression(shingles), k))

  /** k-wide MinHash signature of a string array (order-insensitive). */
  def minHash(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashArray(
      ColumnBridge.expression(shingles), k))

  /** 0-based index of the last element <= t in a sorted long array
    * (-1 when none) — the broadcast as-of probe.
    */
  def sortedLastLeq(arr: Column, t: Column): Column =
    ColumnBridge.column(SortedLastLeq(
      ColumnBridge.expression(arr), ColumnBridge.expression(t)))

  /** Space-join the tokens whose 1-based index is NOT in the sorted
    * coverage array — the span-removal rewrite kernel (one merge walk,
    * O(tokens + covered); see [[JoinTokensExceptSorted]]).
    */
  def joinTokensExceptSorted(tokens: Column, cov: Column): Column =
    ColumnBridge.column(JoinTokensExceptSorted(
      ColumnBridge.expression(tokens), ColumnBridge.expression(cov)))

  /** Sorted distinct xxhash64 word-n-gram shingles of a text column —
    * one-pass native form of the transform/xxhash64 lambda pipeline
    * (see [[ShingleKernel]] for the why).
    */
  def hashedWordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(HashedWordShingles(
      ColumnBridge.expression(text), n))

  /** xxhash64 word-n-gram hashes IN DOCUMENT ORDER (positional, not a
    * set) — the array repeated-substring detection posexplodes.
    */
  def positionalWordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(PositionalWordShingles(
      ColumnBridge.expression(text), n))
}

import SetExpressions.MinHashP

/** Merge-walk intersection count over sorted distinct string arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> inputs")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // Every local must go through ctx.freshName: nullSafeCodeGen splices
      // this body into the enclosing whole-stage-codegen method scope when
      // inputs are non-nullable, and Java forbids redeclaring a method
      // local — two kernels in one collapsed projection would otherwise
      // Janino-fail the stage into interpreted mode.
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val cmp = ctx.freshName("cmp")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $nx = $x.numElements(), $ny = $y.numElements();
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

/** One-pass k-wide MinHash over a string array: per element compute two
  * 32-bit Murmur3 hashes (different seeds), derive the i-th hash as
  * `(h1 + i*h2) mod P` (P = smallest prime > 2^32 — the Broder
  * double-hash family), and track k running minima.
  *
  * The modulus is essential, not cosmetic: without it, `h1 + i*h2` is
  * monotone in h2 for growing i, so every position's argmin converges to
  * the set's min-h2 element and the k positions COLLAPSE to one
  * effective hash — measured 1/64 signature agreement on a pair with
  * true Jaccard 8/9 (q26 missed it at sf0.001). With the modular wrap
  * the positions behave as independent hashes and agreement tracks
  * Jaccard as theory says.
  */
case class MinHashArray(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var e = 0
    while (e < arr.numElements()) {
      val s = arr.getUTF8String(e)
      val h1 = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 42) & 0xffffffffL
      val h2 = Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), 1337) & 0xffffffffL
      var i = 0
      while (i < k) {
        val h = (h1 + i * h2) % MinHashP
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName every local (incl. loop headers) — see SortedIntersectCount.
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val e = ctx.freshName("e"); val s = ctx.freshName("s")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $e = 0; $e < $n; $e++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($e);
         |  long $h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |      $s.numBytes(), 42) & 0xffffffffL;
         |  long $h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(),
         |      $s.numBytes(), 1337) & 0xffffffffL;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = ($h1 + $i * $h2) % ${MinHashP}L;
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"minhash$k"
}

/** Merge-walk intersection count over sorted distinct long arrays. Same
  * contract as [[SortedIntersectCount]] but on fixed-width elements — the
  * representation [[graft.operators.Dedup.hashedShingleSets]] produces.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName every local — see SortedIntersectCount.
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $nx = $x.numElements(), $ny = $y.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_long_intersect_count"
}

/** One-pass k-wide MinHash over a long array (pre-hashed shingles): two
  * Murmur3 hashes of each 8-byte element seed the h1 + i·h2 family —
  * mirrors [[MinHashArray]] without touching string bytes.
  */
case class MinHashLongArray(child: Expression, k: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var e = 0
    while (e < arr.numElements()) {
      val v = arr.getLong(e)
      val h1 = Murmur3_x86_32.hashLong(v, 42) & 0xffffffffL
      val h2 = Murmur3_x86_32.hashLong(v, 1337) & 0xffffffffL
      var i = 0
      while (i < k) {
        val h = (h1 + i * h2) % MinHashP
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      e += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName every local — see SortedIntersectCount.
      val mins = ctx.freshName("mins"); val n = ctx.freshName("n")
      val e = ctx.freshName("e"); val v = ctx.freshName("v")
      val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i"); val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $e = 0; $e < $n; $e++) {
         |  long $v = $c.getLong($e);
         |  long $h1 = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashLong($v, 42) & 0xffffffffL;
         |  long $h2 = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |    .hashLong($v, 1337) & 0xffffffffL;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = ($h1 + $i * $h2) % ${MinHashP}L;
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"minhash_long$k"
}

/** Sorted distinct xxhash64(seed 42) hashes of the word n-grams of a
  * string column, as one linear pass ([[ShingleKernel.hashedWordShingles]]).
  * Semantically identical to the four-level lambda formulation in
  * [[graft.operators.Dedup.hashedShingleSets]]'s scaladoc; exists because
  * Catalyst copies expressions into filters where the lambda form was
  * interpreted and re-split the text per element. Generated code is a
  * single static call — codegen-cache-stable, cheap wherever it's copied.
  */
case class HashedWordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    ShingleKernel.hashedWordShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleKernel.hashedWordShingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"hashed_word_shingles$n"
}

/** Positional twin of [[HashedWordShingles]]: one xxhash64(seed 42) per
  * word n-gram, in document order, neither sorted nor deduped — position
  * i of the output is the gram starting at token i. The shape
  * [[graft.operators.Dedup.repeatedSpans]] posexplodes to find repeated
  * substrings; same one-pass kernel, same codegen-stability argument.
  */
case class PositionalWordShingles(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if n < 1 => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $n")
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input")
  }

  override def nullSafeEval(t: Any): Any =
    ShingleKernel.positionalWordShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleKernel.positionalWordShingles($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"positional_word_shingles$n"
}

/** Span-removal rewrite kernel: space-join the elements of a token array
  * whose 1-based index does NOT appear in a SORTED ascending long array of
  * covered positions. One merge walk over (tokens, covered) —
  * O(tokens + covered) and fully codegen'd, replacing the
  * `filter(toks, (t, i) => !array_contains(cov, i+1))` higher-order
  * lambda whose interpreted evaluation was O(tokens × covered) per
  * document (quadratic on heavily-duplicated documents).
  */
case class JoinTokensExceptSorted(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<bigint>)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val cov = b.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val m = cov.numElements()
    val kept = new Array[UTF8String](n)
    var kn = 0
    var ci = 0
    var i = 0
    while (i < n) {
      val p = (i + 1).toLong
      while (ci < m && cov.getLong(ci) < p) ci += 1
      if (!(ci < m && cov.getLong(ci) == p)) {
        kept(kn) = toks.getUTF8String(i)
        kn += 1
      }
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "),
      java.util.Arrays.copyOf(kept, kn): _*)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, cov) => {
      val u = "org.apache.spark.unsafe.types.UTF8String"
      // freshName every local — see SortedIntersectCount.
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val kept = ctx.freshName("kept"); val kn = ctx.freshName("kn")
      val ci = ctx.freshName("ci"); val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      // NOT Arrays.copyOf: it's generic, and Janino compiles generics
      // raw — the call site types as (Object[], int) → Object[], which
      // fails overload resolution against concatWs(UTF8String,
      // UTF8String[]) and silently drops the projection to interpreted
      // eval. System.arraycopy into an exactly-typed array instead.
      s"""
         |int $n = $toks.numElements();
         |int $m = $cov.numElements();
         |$u[] $kept = new $u[$n];
         |int $kn = 0, $ci = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $p = (long) ($i + 1);
         |  while ($ci < $m && $cov.getLong($ci) < $p) { $ci++; }
         |  if (!($ci < $m && $cov.getLong($ci) == $p)) {
         |    $kept[$kn++] = $toks.getUTF8String($i);
         |  }
         |}
         |$u[] $out = new $u[$kn];
         |System.arraycopy($kept, 0, $out, 0, $kn);
         |${ev.value} = $u.concatWs($u.fromString(" "), $out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "join_tokens_except_sorted"
}

/** Binary search over a SORTED ascending long array: 0-based index of the
  * LAST element <= t, or -1 when every element is greater (or the array
  * is empty). The broadcast as-of join's probe kernel — O(log n) per left
  * row against a per-key packed right side, fully codegen'd.
  */
case class SortedLastLeq(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint)")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getLong(mid) <= t) { ans = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, t) => {
      // freshName every local — see SortedIntersectCount.
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val ans = ctx.freshName("ans"); val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0, $hi = $a.numElements() - 1, $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getLong($mid) <= $t) { $ans = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |${ev.value} = $ans;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_last_leq"
}
