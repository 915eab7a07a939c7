package graft.fingerprint

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Suffix-array substring machinery for the asymmetric near-dup verify pass
  * (north_rule: "verify candidate pairs by exact Jaccard plus a suffix-array
  * substring pass"; SURVEY.md §7 step 5).
  *
  * Shingle-set containment can over-accept (reordered tokens keep the same
  * shingle multiset across block boundaries) — a true substring check can't.
  * The pass computes the longest common substring (LCS) of two normalized
  * texts with a generalized suffix array + Kasai LCP, then scores
  * `lcs / min(len)`: 1.0 iff the shorter text occurs verbatim inside the
  * longer (truncation / quotation near-dups, the analog of the reference's
  * mixed-width hash degradation rule `processing/types.rs:39-43` — compare
  * at the smaller granularity).
  */
object SuffixArray {

  /** Maximum input length (21-bit positions in the packed sort keys) —
    * far above the verify-stage cap (`DedupConfig.saMaxChars` per side).
    */
  val MaxLen: Int = (1 << 21) - 1

  /** Suffix array by prefix doubling, O(n log² n), allocation-light: each
    * round packs (rank, rank+k, pos) into one long per suffix and sorts the
    * primitive array (`java.util.Arrays.sort(long[])` — dual-pivot, no
    * boxing, no comparator dispatch). Inputs are capped by
    * `DedupConfig.saMaxChars`, well under [[MaxLen]].
    */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    val sa = new Array[Int](n)
    if (n <= 1) { if (n == 1) sa(0) = 0; return sa }
    require(n <= MaxLen, s"suffix array input too long: $n > $MaxLen")

    val PosMask = (1L << 21) - 1
    val rank = new Array[Int](n)
    val keys = new Array[Long](n)

    // round 0: sort by character (values ≥ -1 → +1 keeps keys non-negative)
    var i = 0
    while (i < n) { keys(i) = ((s(i) + 1).toLong << 21) | i; i += 1 }
    java.util.Arrays.sort(keys)
    var maxRank = 0
    rank((keys(0) & PosMask).toInt) = 0
    i = 1
    while (i < n) {
      if ((keys(i) >>> 21) != (keys(i - 1) >>> 21)) maxRank += 1
      rank((keys(i) & PosMask).toInt) = maxRank
      i += 1
    }

    var k = 1
    while (k < n && maxRank < n - 1) {
      i = 0
      while (i < n) {
        val r2 = if (i + k < n) rank(i + k) + 1L else 0L
        keys(i) = ((rank(i) + 1L) << 42) | (r2 << 21) | i
        i += 1
      }
      java.util.Arrays.sort(keys)
      maxRank = 0
      val newRank = new Array[Int](n) // rank() is still read via keys' packed ranks
      newRank((keys(0) & PosMask).toInt) = 0
      i = 1
      while (i < n) {
        if ((keys(i) >>> 21) != (keys(i - 1) >>> 21)) maxRank += 1
        newRank((keys(i) & PosMask).toInt) = maxRank
        i += 1
      }
      System.arraycopy(newRank, 0, rank, 0, n)
      k <<= 1
    }
    i = 0
    while (i < n) { sa(i) = (keys(i) & PosMask).toInt; i += 1 }
    sa
  }

  /** Kasai's LCP array: lcp(i) = longest common prefix of sa(i-1) and sa(i). */
  def kasaiLcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Longest common substring length of two strings via a generalized suffix
    * array over `a ++ [-1] ++ b` (the sentinel sorts below every code point
    * and never matches, so no common prefix crosses the boundary). The LCS is
    * the max LCP between a pair of suffixes from different strings; since LCP
    * of non-adjacent SA entries is the min over the gap, it suffices to scan
    * adjacent entries whose origins differ.
    */
  def lcsLength(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val la = a.length
    val n = la + 1 + b.length
    val s = new Array[Int](n)
    var i = 0
    while (i < la) { s(i) = a.charAt(i).toInt; i += 1 }
    s(la) = -1
    i = 0
    while (i < b.length) { s(la + 1 + i) = b.charAt(i).toInt; i += 1 }
    val sa = build(s)
    val lcp = kasaiLcp(s, sa)
    var best = 0
    i = 1
    while (i < n) {
      val fromA = sa(i) < la
      val prevFromA = sa(i - 1) < la
      if (fromA != prevFromA && lcp(i) > best) best = lcp(i)
      i += 1
    }
    best
  }
}

/** Catalyst expression: longest common substring length (int) of two UTF-8
  * strings, via [[SuffixArray.lcsLength]]. Used only on the ambiguous verify
  * slice (pairs whose shingle containment gates them in), never in the hot
  * fingerprint path.
  */
case class SuffixArrayLCS(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"suffix_array_lcs expects (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(SuffixArray.lcsLength(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("saLcsExpr", this, classOf[SuffixArrayLCS].getName)
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = ((java.lang.Integer) $ref.nullSafeEval($l, $r)).intValue();")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SuffixArrayLCS =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "suffix_array_lcs"
}
