package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized indel similarity × 100 — the score the reference calls
  * `rapidfuzz.fuzz.ratio` (reference `src/firefly_vcut/fuzz.py:1,26,36`):
  * Levenshtein restricted to insert/delete (no substitution),
  * normalized by the summed lengths:
  *
  *   ratio(a, b) = 100 · (1 − indel_dist(a, b) / (|a| + |b|))
  *               = 200 · LCS(a, b) / (|a| + |b|)
  *
  * Unicode-codepoint based (the content is CJK; byte- or UTF-16-unit
  * distances would mis-score), two empty strings score 100.
  *
  * Implemented as a native Catalyst expression with codegen so the
  * scoring loop of the fuzzy pipeline stays inside whole-stage codegen
  * (no UDF serialization, no Row boxing) — this is the hot inner loop
  * of the flagship query and the main CPU cost at scale.
  */
object FuzzUtils {

  /** Reference two-row LCS DP — kept as the slow path / test oracle
    * for the bit-parallel implementation below.
    */
  def indelDistanceDP(sa: String, sb: String): Int = {
    val a0 = sa.codePoints().toArray
    val b0 = sb.codePoints().toArray
    // trim common prefix / suffix (never changes the indel distance)
    var lo = 0
    val maxLo = math.min(a0.length, b0.length)
    while (lo < maxLo && a0(lo) == b0(lo)) lo += 1
    var aHi = a0.length
    var bHi = b0.length
    while (aHi > lo && bHi > lo && a0(aHi - 1) == b0(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val m = aHi - lo
    val n = bHi - lo
    if (m == 0) return n
    if (n == 0) return m
    // ensure the inner array is the shorter side
    val (x, xLen, y, yLen) =
      if (m >= n) (a0, m, b0, n) else (b0, n, a0, m)
    // LCS length DP, rows over y
    val prev = new Array[Int](yLen + 1)
    val cur = new Array[Int](yLen + 1)
    var i = 1
    while (i <= xLen) {
      val xi = x(lo + i - 1)
      var j = 1
      while (j <= yLen) {
        cur(j) =
          if (xi == y(lo + j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, yLen + 1)
      i += 1
    }
    m + n - 2 * prev(yLen)
  }

  /** Bit-parallel LCS length (Hyyrö 2004 / Crochemore–Iliopoulos–
    * Pinzón): the pattern's positions are bits; per text symbol the
    * column vector updates as `V' = (V + U) | (V − U)` with
    * `U = V & M[symbol]`; LCS = zero bits of V among the pattern
    * positions. Multi-word with explicit carry/borrow propagation so
    * patterns longer than 64 codepoints work. O(n · ⌈m/64⌉) vs the
    * DP's O(n · m).
    *
    * Pattern match-masks are cached per thread keyed by the pattern
    * string: in the fuzzy pipeline the same song lyrics score against
    * many windows, so the preprocessing amortizes away.
    */
  private final val maskCache =
    ThreadLocal.withInitial[java.util.HashMap[String, (Int, java.util.HashMap[Integer, Array[Long]])]](
      () => new java.util.HashMap)

  private def patternMasks(p: String): (Int, java.util.HashMap[Integer, Array[Long]]) = {
    val cache = maskCache.get()
    var entry = cache.get(p)
    if (entry == null) {
      if (cache.size() > 512) cache.clear()
      val cps = p.codePoints().toArray
      val words = (cps.length + 63) >>> 6
      val masks = new java.util.HashMap[Integer, Array[Long]]
      var i = 0
      while (i < cps.length) {
        var m = masks.get(cps(i))
        if (m == null) { m = new Array[Long](words); masks.put(cps(i), m) }
        m(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
      entry = (cps.length, masks)
      cache.put(p, entry)
    }
    entry
  }

  /** Indel distance via bit-parallel LCS; `sa` is treated as the
    * (cached) pattern.
    */
  def indelDistance(sa: String, sb: String): Int = {
    val (m, masks) = patternMasks(sa)
    val bcp = sb.codePoints().toArray
    val n = bcp.length
    if (m == 0) return n
    if (n == 0) return m
    val words = (m + 63) >>> 6
    val v = new Array[Long](words)
    java.util.Arrays.fill(v, -1L)
    var j = 0
    while (j < n) {
      val mj = masks.get(bcp(j))
      if (mj != null) {
        var carry = 0L  // for V + U
        var borrow = 0L // for V - U
        var w = 0
        while (w < words) {
          val x = v(w)
          val u = x & mj(w)
          val sum = x + u + carry
          carry = (((x & u) | ((x | u) & ~sum)) >>> 63)
          val diff = x - u - borrow
          borrow = (((~x & u) | ((~x | u) & diff)) >>> 63)
          v(w) = sum | diff
          w += 1
        }
      }
      j += 1
    }
    // LCS = zero bits of V among the m pattern positions
    var lcs = 0
    var w = 0
    while (w < words) {
      val bitsInWord = math.min(64, m - (w << 6))
      val mask = if (bitsInWord == 64) -1L else (1L << bitsInWord) - 1
      lcs += bitsInWord - java.lang.Long.bitCount(v(w) & mask)
      w += 1
    }
    m + n - 2 * lcs
  }

  /** rapidfuzz-compatible `fuzz.ratio` in [0, 100]. */
  def ratio(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val la = sa.codePointCount(0, sa.length)
    val lb = sb.codePointCount(0, sb.length)
    if (la + lb == 0) return 100.0
    100.0 * (1.0 - indelDistance(sa, sb).toDouble / (la + lb))
  }
}

/** `indel_ratio(a, b)` as a codegen'd Catalyst expression. */
case class IndelRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"indel_ratio requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "indel_ratio"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FuzzUtils.ratio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FuzzUtils.ratio($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IndelRatio {
  /** Column-API entry point: `indel_ratio($"a", $"b")`. */
  def indel_ratio(a: Column, b: Column): Column =
    GraftShims.column(
      IndelRatio(GraftShims.expression(a), GraftShims.expression(b)))
}
