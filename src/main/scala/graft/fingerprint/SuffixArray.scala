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
    // verbatim-containment fast path: LCS == min(len) iff the shorter string
    // occurs verbatim inside the longer, and String.contains (intrinsified
    // indexOf) answers that ~100× cheaper than the generalized SA. True
    // containment dups — truncations and quotes, the accept majority of the
    // ambiguous verify slice — are verbatim in the normalized text by
    // definition, so they all take this exit; only near-miss pairs (edits
    // inside the quoted span, and rejects) pay the full SA+LCP build.
    // Worst-case safe: even a pathological periodic 20k×20k indexOf costs
    // about the same as the SA it would have fallen through to.
    if (a.length <= b.length) { if (b.contains(a)) return a.length }
    else if (a.contains(b)) return b.length
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

  /** Decision form of the substring pass: `LCS(a,b) / min(len) >= threshold`
    * WITHOUT computing the LCS. LCS >= T iff the strings share some common
    * substring of length exactly T (common substrings are closed under
    * taking substrings), so the test reduces to one rolling-hash window
    * scan: hash every T-window of the shorter string into a table
    * (min-T+1 <= (1-threshold)*min + 1 windows — a few hundred at the
    * verify-stage cap), roll the longer string through, and VERIFY every
    * hash hit by direct comparison — hashing only prunes, equality decides,
    * so the result is exact, not probabilistic. O(n+m) expected vs the
    * O(n log^2 n) generalized-SA build; this is what the pipeline's verify
    * stage calls (it only thresholds the score — the LCS value itself is
    * never consumed there).
    *
    * T is chosen as the smallest integer whose DOUBLE quotient with min
    * clears the threshold, replicating `lcsLength(a,b)/min >= threshold`
    * bit-for-bit (floor/ceil of threshold*min can disagree with the
    * floating-point division by one ulp — e.g. 18/20 >= 0.9 is true while
    * ceil(0.9*20) = 19).
    */
  def lcsRatioAtLeast(a: String, b: String, threshold: Double): Boolean = {
    if (threshold <= 0) return true // ratio >= 0 always; the t-search floor
    // below would otherwise demand a length-1 common substring and invert
    // the decision for disjoint-alphabet inputs at non-positive thresholds
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    val min = s.length
    if (min == 0) return threshold <= 1.0 // saContainment: minLen 0 scores 1.0
    var t = math.max(1, math.floor(threshold * min).toInt - 1)
    while (t <= min && t.toDouble / min < threshold) t += 1
    if (t > min) return false // threshold above 1.0 is unsatisfiable
    val nWin = min - t + 1

    // polynomial rolling hash over chars; collisions only cost a verify
    val B = 0x100000001B3L
    var pw = 1L // B^(t-1)
    var i = 0
    while (i < t - 1) { pw *= B; i += 1 }

    // hash table over the shorter string's windows: open addressing on the
    // hash, chaining equal hashes via a parallel next[] so a (vanishingly
    // rare) intra-table collision cannot shadow a real match
    var cap = 8
    while (cap < nWin * 2) cap <<= 1
    val mask = cap - 1
    val slotHash = new Array[Long](cap)
    val slotPos = new Array[Int](cap) // first window start + 1 (0 = empty)
    val nextPos = new Array[Int](nWin) // chain of further starts + 1
    val chainTail = new Array[Int](cap)
    var h = 0L
    i = 0
    while (i < t) { h = h * B + s.charAt(i); i += 1 }
    var w = 0
    while (w < nWin) {
      var idx = (HashKernels.avalanche(h) & 0x7fffffffL).toInt & mask
      while (slotPos(idx) != 0 && slotHash(idx) != h) idx = (idx + 1) & mask
      if (slotPos(idx) == 0) { slotHash(idx) = h; slotPos(idx) = w + 1; chainTail(idx) = w }
      else { nextPos(chainTail(idx)) = w + 1; chainTail(idx) = w }
      if (w + t < min) h = (h - s.charAt(w) * pw) * B + s.charAt(w + t)
      w += 1
    }

    h = 0L
    i = 0
    while (i < t) { h = h * B + l.charAt(i); i += 1 }
    w = 0
    val lWin = l.length - t + 1
    while (w < lWin) {
      var idx = (HashKernels.avalanche(h) & 0x7fffffffL).toInt & mask
      while (slotPos(idx) != 0 && slotHash(idx) != h) idx = (idx + 1) & mask
      if (slotPos(idx) != 0) {
        var p = slotPos(idx)
        while (p != 0) {
          if (l.regionMatches(w, s, p - 1, t)) return true
          p = nextPos(p - 1)
        }
      }
      if (w + t < l.length) h = (h - l.charAt(w) * pw) * B + l.charAt(w + t)
      w += 1
    }
    false
  }
}

/** Catalyst expression: longest common substring length (int) of two UTF-8
  * strings, via [[SuffixArray.lcsLength]]. Used only on the ambiguous verify
  * slice (pairs whose shingle containment gates them in), never in the hot
  * fingerprint path.
  */
case class SuffixArrayLCS(left: Expression, right: Expression)
    extends BinaryExpression with BoxedKernelCodegen {

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

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SuffixArrayLCS =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "suffix_array_lcs"
}

/** Catalyst expression: `LCS(a,b) / min(len) >= threshold` as a boolean,
  * via [[SuffixArray.lcsRatioAtLeast]]'s O(n+m) window scan — the decision
  * form the verify stage consumes (it never reads the LCS value, and the
  * generalized-SA build is the pipeline's single most CPU-dense kernel).
  * Decision-equivalent to [[graft.fingerprint.Fingerprints.saContainment]]
  * `>= threshold` — both measure in UTF-16 code units (lcsLength's unit;
  * `length()` counts code points and would disagree on supplementary-plane
  * text) — including the double-division edge cases (property-gated in
  * SuffixArraySpec).
  */
case class SuffixArrayContainsAtLeast(left: Expression, right: Expression,
                                      threshold: Double)
    extends BinaryExpression with BoxedKernelCodegen {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"suffix_array_contains_at_least expects (string, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Boolean.valueOf(SuffixArray.lcsRatioAtLeast(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString,
      threshold))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SuffixArrayContainsAtLeast =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "suffix_array_contains_at_least"
}
