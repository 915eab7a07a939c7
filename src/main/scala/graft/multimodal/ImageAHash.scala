package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL pixel-level decode for uncompressed BMPs → 8×8 mean-threshold
  * average hash — the reference's actual perceptual-hash kernel
  * (image-deduper `src/processing/core.rs:37-104`: decode → grayscale →
  * 8×8 resize → mean threshold → 64-bit hash). BI_RGB 24/32-bpp BMP: the
  * pixels are literally in the bytes, so this decoder keeps its own fused
  * loop; PNG ([[PngPixels]], JDK Inflater), GIF ([[GifPixels]], pure
  * LZW) and JPEG ([[JpegPixels]], the JDK's ImageIO plugin) decode to a
  * luma raster and share the same pinned kernel via [[AHashKernel]].
  *
  * Kernel definition (pinned — goldens and the SQL oracle depend on it):
  *  - grayscale: integer Rec.601 luma  (299·R + 587·G + 114·B) / 1000
  *  - resize: 8×8 box mean; cell (cx,cy) covers x ∈ [cx·w/8,(cx+1)·w/8)
  *    (floor arithmetic; degenerate cells widen to ≥1 pixel so w,h < 8
  *    still decode)
  *  - threshold: bit (63 − (cy·8 + cx)) is set iff cellMean > globalMean
  *    (strict: a solid image hashes to 0)
  *
  * Corrupt-input contract mirrors [[ImageHeader]]: malformed, truncated,
  * compressed, or non-BMP bytes return null, never throw (S9 recovery).
  */
object BmpAHash {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** Max decodable dimension: bounds per-row work (tiered-cost posture —
    * the analog of the reference's size-tiered downscale). A 16k×16k
    * uncompressed BMP is already 1 GB; anything larger is hostile input.
    */
  val MaxDim = 16384

  /** null (boxed) when not a decodable uncompressed BMP. */
  def ahash(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 54) return null
    try {
      if (!(u8(b, 0) == 'B' && u8(b, 1) == 'M')) return null
      val dataOffset = le32(b, 10)
      val dibSize = le32(b, 14)
      if (dibSize < 40) return null // BITMAPCOREHEADER etc: not supported
      val w = le32(b, 18)
      val hRaw = le32(b, 22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bpp = le16(b, 28)
      val compression = le32(b, 30)
      if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return null
      if (compression != 0) return null // BI_RGB only: pixels are raw bytes
      if (bpp != 24 && bpp != 32) return null
      val bytesPerPx = bpp / 8
      val stride = ((bytesPerPx * w + 3) / 4) * 4
      if (dataOffset < 54 || dataOffset.toLong + stride.toLong * h > b.length)
        return null

      // 8×8 box mean over integer luma; Long accumulators cannot overflow
      // (max 16384² px × 255 luma < 2^46)
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var cy = 0
      while (cy < 8) {
        val y0 = cy * h / 8
        val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
        var y = y0
        while (y < y1) {
          val fileRow = if (topDown) y else h - 1 - y
          val rowOff = dataOffset + fileRow * stride
          var cx = 0
          while (cx < 8) {
            val x0 = cx * w / 8
            val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
            var s = 0L
            var x = x0
            while (x < x1) {
              val p = rowOff + x * bytesPerPx
              // BMP stores BGR(A)
              val lum = (299 * u8(b, p + 2) + 587 * u8(b, p + 1) + 114 * u8(b, p)) / 1000
              s += lum
              x += 1
            }
            val cell = cy * 8 + cx
            sums(cell) += s
            counts(cell) += (x1 - x0)
            cx += 1
          }
          y += 1
        }
        cy += 1
      }
      var total = 0L
      var totalN = 0L
      var i = 0
      while (i < 64) { total += sums(i); totalN += counts(i); i += 1 }
      // compare cell means to the global mean in exact integer arithmetic:
      // cellSum/cellN > total/totalN  ⇔  cellSum·totalN > total·cellN
      // (cellSum·totalN ≤ 2^46 · 2^28 < 2^63: no overflow)
      var hash = 0L
      i = 0
      while (i < 64) {
        if (sums(i) * totalN > total * counts(i)) hash |= 1L << (63 - i)
        i += 1
      }
      java.lang.Long.valueOf(hash)
    } catch { case _: Exception => null }
  }
}

/** Deterministic BMP synthesis — fixture generator for the aHash oracle
  * query and the golden tests (the analog of the reference's synthesized
  * test images, `processing_tests.rs:93-119`). Lives in main because
  * `SparkEntry.q_image_ahash` builds its oracle-checkable blobs with it.
  */
object BmpSynth {

  /** Uncompressed BI_RGB BMP with the given geometry; `rgb(x, y)` returns
    * 0xRRGGBB for the pixel at image coordinates (x left→right, y
    * top→bottom). Negative `height` convention: pass `topDown = true`.
    */
  def bmp(w: Int, h: Int, bpp: Int = 24, topDown: Boolean = false)
         (rgb: (Int, Int) => Int): Array[Byte] = {
    require(bpp == 24 || bpp == 32, "BI_RGB 24/32-bpp only")
    val bytesPerPx = bpp / 8
    val stride = ((bytesPerPx * w + 3) / 4) * 4
    val dataOffset = 54
    val size = dataOffset + stride * h
    val b = new Array[Byte](size)
    def le16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def le32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, dataOffset)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, if (topDown) -h else h)
    le16(26, 1); le16(28, bpp)
    le32(30, 0) // BI_RGB
    var y = 0
    while (y < h) {
      val fileRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        val p = dataOffset + fileRow * stride + x * bytesPerPx
        b(p) = (c & 0xFF).toByte            // B
        b(p + 1) = ((c >> 8) & 0xFF).toByte // G
        b(p + 2) = ((c >> 16) & 0xFF).toByte // R
        if (bytesPerPx == 4) b(p + 3) = 0xFF.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** The three analytically-hashable oracle patterns (pattern = doc_id % 3):
    * 0 = left half black / right half white  → aHash 0x0F0F0F0F0F0F0F0F
    * 1 = top half black / bottom half white  → aHash 0x00000000FFFFFFFF
    * 2 = solid gray                          → aHash 0 (strict threshold)
    */
  val OraclePatterns: IndexedSeq[Array[Byte]] = IndexedSeq(
    bmp(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF),
    bmp(8, 8)((_, y) => if (y < 4) 0x000000 else 0xFFFFFF),
    bmp(8, 8)((_, _) => 0x808080))

  val OracleHashes: IndexedSeq[Long] =
    IndexedSeq(0x0F0F0F0F0F0F0F0FL, 0x00000000FFFFFFFFL, 0L)
}

/** Catalyst wrapper: binary → 64-bit aHash (LongType), null for anything
  * but a decodable BMP, PNG, or GIF ([[PixelAHash]] routes by magic
  * bytes). Scalar with codegen — rides inside project stages, composes
  * with `bit_count(a ^ b)` Hamming directly.
  */
case class ImageAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_ahash expects binary, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    PixelAHash.ahash(input.asInstanceOf[Array[Byte]]) // null ⇒ SQL null

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PixelAHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // freshName, not a fixed local: with a non-nullable child the fragment
    // lands UNGUARDED in the generated function, and two image_ahash calls
    // fused into one whole-stage-codegen scope would redeclare `ah` and
    // kick the whole stage back to interpreted execution
    val ah = ctx.freshName("ah")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $ah = $cls.ahash($c);
      ${ev.isNull} = $ah == null;
      ${ev.value} = ${ev.isNull} ? -1L : $ah.longValue();""")
  }

  override protected def withNewChildInternal(newChild: Expression): ImageAHash =
    copy(child = newChild)

  override def prettyName: String = "image_ahash"
}
