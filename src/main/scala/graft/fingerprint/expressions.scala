package graft.fingerprint

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the fingerprint stage.
  *
  * These are the web-text analogs of the reference's per-item hash kernels
  * (image-deduper `processing/core.rs:37-104` aHash, `:109-154` enhanced
  * 1024-bit hash): one fused pass per row, no shuffle, no per-row JVM object
  * churn beyond the output array.  They are deliberately scalar expressions
  * (not UDAFs): a MinHash/SimHash signature is a pure function of one row's
  * token array, so it rides inside project/codegen stages and Catalyst keeps
  * column pruning + pushdown around it.
  */

/** 64-bit xxhash-style finalizer used to derive per-permutation hash
  * families deterministically. Public-domain xxhash64 avalanche.
  */
object HashKernels {
  @inline def avalanche(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Deterministic (a_i, b_i) affine coefficients for the MinHash
    * permutation family h_i(x) = a_i*x + b_i over Z_2^64, a_i odd.
    * Multiply-shift universal hashing; min taken unsigned.
    */
  def coefficients(numPerms: Int, seed: Long): (Array[Long], Array[Long]) = {
    val as = new Array[Long](numPerms)
    val bs = new Array[Long](numPerms)
    var i = 0
    while (i < numPerms) {
      as(i) = avalanche(seed + 2L * i + 1) | 1L // odd
      bs(i) = avalanche(seed + 2L * i + 2)
      i += 1
    }
    (as, bs)
  }
}

/** MinHash signature over a pre-hashed shingle array.
  *
  * Input: array<long> (64-bit shingle hashes, typically
  * `transform(shingles, xxhash64)`), deduplicated upstream.
  * Output: array<long> of length `numPerms` — slot i =
  * min_{x in shingles} (a_i * x + b_i), compared unsigned.
  *
  * Plays the role of the reference's Enhanced([u64;16]) perceptual hash
  * (image-deduper `src/processing/types.rs:13-14`,
  * `src/processing/core.rs:109-154`): a wide similarity signature whose
  * bandwise collisions estimate Jaccard similarity.
  *
  * Empty input array → all slots = unsigned max (0xFFFF...), a sentinel
  * signature that never collides with a real band except against another
  * empty doc (desired: empty docs are exact dups of each other and are
  * caught by the content-hash path instead).
  */
case class MinHashSignature(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  @transient private lazy val (as, bs) = HashKernels.coefficients(numPerms, seed)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Long](numPerms)
    java.util.Arrays.fill(mins, -1L) // unsigned max sentinel
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val x = arr.getLong(j)
        var i = 0
        while (i < numPerms) {
          val h = as(i) * x + bs(i)
          // unsigned compare via sign-bit flip
          if ((h ^ Long.MinValue) < (mins(i) ^ Long.MinValue)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash over a pre-hashed token array (multiset — token frequency
  * weights the bit votes, matching Charikar's construction).
  *
  * Input: array<long> token hashes. Output: long whose bit j is set iff the
  * signed vote sum over tokens for bit j is positive.
  *
  * Plays the role of the reference's Standard(u64) aHash
  * (image-deduper `src/processing/types.rs:11`, `src/processing/core.rs:37-104`):
  * the cheap 64-bit fingerprint compared by XOR+popcount Hamming distance
  * (`src/processing/types.rs:19-44` → Spark `bit_count(a ^ b)`).
  *
  * Empty input → 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<bigint>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = arr.getLong(j)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Deterministic HTML → text extraction.
  *
  * The web-text analog of the reference's per-format decoders
  * (image-deduper `src/formats/{jpeg,png,tiff,raw,heic}.rs`, dispatcher
  * `src/processing/utils/file_processing.rs:15-41`) including its
  * corrupt-input recovery (`src/formats/jpeg.rs:34-66`): malformed bytes
  * never throw — they degrade to best-effort text (and the pipeline layer
  * routes empty extractions to the quarantine table).
  *
  * Contract (pinned by golden tests): byte-identical output per url —
  *   1. decode UTF-8 (replacement char on invalid sequences),
  *   2. drop <script>/<style>/<nav>/<header>/<footer>/<head> blocks and
  *      HTML comments entirely (boilerplate),
  *   3. replace every remaining tag with a single space,
  *   4. decode the five core entities + &nbsp; + decimal &#NN;,
  *   5. collapse all whitespace runs to single spaces and trim.
  */
object TextExtraction {
  private val dropBlocks = Seq("script", "style", "nav", "header", "footer", "head")

  def extract(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    var s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    // comments first so commented-out tags don't confuse block dropping
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    for (tag <- dropBlocks)
      s = s.replaceAll(s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>", " ")
    s = s.replaceAll("(?s)<[^>]*>", " ")
    s = decodeEntities(s)
    s = s.replaceAll("\\s+", " ").trim
    s
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" | "#39" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#") && e.drop(1).nonEmpty && e.drop(1).forall(_.isDigit) =>
              try String.valueOf(e.drop(1).toInt.toChar)
              catch { case _: Exception => "&" + ent + ";" }
            case _ => null
          }
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}

/** Catalyst wrapper for [[TextExtraction.extract]]: binary → string. */
case class ExtractText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"extract_text expects binary, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TextExtraction.extract(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractExpr", this, classOf[ExtractText].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractText =
    copy(child = newChild)

  override def prettyName: String = "extract_text"
}
