package graft.multimodal

/** REAL pixel-level decode for GIF87a/89a first frames → the pinned 8×8
  * mean-threshold kernel ([[AHashKernel]], reference kernel image-deduper
  * `src/processing/core.rs:37-104`). GIF's LZW is ~80 lines of pure
  * integer code — no codec dependency — which makes aHash real for the
  * second legacy format after BMP/PNG.
  *
  * Scope: the FIRST image frame's raster (w,h from its image descriptor;
  * animation composition and disposal are irrelevant to a content
  * fingerprint). Interlaced frames are de-interlaced; a frame's
  * transparent index is treated as its palette color (fingerprint, not
  * renderer). Corrupt/truncated/oversized input → null, never throw (S9).
  */
object GifPixels {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 13 &&
      b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Decode first frame to (width, height, row-major luma); null on any
    * malformed, truncated, or oversized input ([[PngPixels.MaxPixels]]).
    */
  def decodeLuma(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (!isGif(b)) return null
    try {
      var off = 6
      // logical screen descriptor + optional global color table
      val packed = u8(b, off + 4)
      off += 7
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (off + 3 * n > b.length) return null
        gct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
        off += 3 * n
      }
      // walk blocks to the first image descriptor
      while (off < b.length) {
        u8(b, off) match {
          case 0x21 => // extension: label + sub-blocks until terminator
            off += 2
            while (off < b.length && u8(b, off) != 0) off += 1 + u8(b, off)
            off += 1
          case 0x2C =>
            if (off + 10 > b.length) return null
            val w = le16(b, off + 5); val h = le16(b, off + 7)
            val ipacked = u8(b, off + 9)
            off += 10
            var pal = gct
            if ((ipacked & 0x80) != 0) {
              val n = 2 << (ipacked & 7)
              if (off + 3 * n > b.length) return null
              pal = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
              off += 3 * n
            }
            if (pal == null || w <= 0 || h <= 0 ||
                w.toLong * h > PngPixels.MaxPixels) return null
            val interlaced = (ipacked & 0x40) != 0
            if (off >= b.length) return null
            val minCode = u8(b, off); off += 1
            if (minCode < 2 || minCode > 8) return null
            // concatenate LZW sub-blocks
            var data = new Array[Byte](0); var dataLen = 0
            while (off < b.length && u8(b, off) != 0) {
              val n = u8(b, off)
              if (off + 1 + n > b.length) return null
              if (data.length < dataLen + n) {
                val grown = new Array[Byte](math.max(data.length * 2, dataLen + n))
                System.arraycopy(data, 0, grown, 0, dataLen)
                data = grown
              }
              System.arraycopy(b, off + 1, data, dataLen, n)
              dataLen += n
              off += 1 + n
            }
            val idx = lzwDecode(minCode, data, dataLen, w * h)
            if (idx == null) return null
            val luma = new Array[Byte](w * h)
            var i = 0
            while (i < w * h) {
              // de-interlace: pass rows 0/8, 4/8, 2/4, 1/2 arrive in order
              val y = i / w
              val outY = if (!interlaced) y else {
                val p1 = (h + 7) / 8; val p2 = (h + 3) / 8; val p3 = (h + 1) / 4
                if (y < p1) y * 8
                else if (y < p1 + p2) (y - p1) * 8 + 4
                else if (y < p1 + p2 + p3) (y - p1 - p2) * 4 + 2
                else (y - p1 - p2 - p3) * 2 + 1
              }
              val pi = (idx(i) & 0xFF) * 3
              if (pi + 2 >= pal.length) return null
              luma(outY * w + i % w) =
                ((299 * u8(pal, pi) + 587 * u8(pal, pi + 1) +
                  114 * u8(pal, pi + 2)) / 1000).toByte
              i += 1
            }
            return (w, h, luma)
          case 0x3B => return null // trailer before any frame
          case _ => return null
        }
      }
      null
    } catch { case _: Exception => null }
  }

  /** GIF LZW: variable-width codes LSB-first, dictionary of (prefix code,
    * suffix byte) chains capped at 4096 entries, reset on CLEAR.
    */
  private def lzwDecode(minCode: Int, data: Array[Byte], dataLen: Int,
                        nPixels: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](nPixels)
    var outLen = 0
    var dictSize = eoi + 1
    var codeWidth = minCode + 1
    var prevCode = -1
    var bitPos = 0
    val totalBits = dataLen * 8
    var firstByteOfPrev = 0
    while (outLen < nPixels) {
      if (bitPos + codeWidth > totalBits) return null // truncated stream
      var code = 0
      var i = 0
      while (i < codeWidth) {
        val bp = bitPos + i
        if ((data(bp >> 3) & (1 << (bp & 7))) != 0) code |= 1 << i
        i += 1
      }
      bitPos += codeWidth
      if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCode + 1; prevCode = -1
      } else if (code == eoi) {
        return if (outLen == nPixels) out else null
      } else {
        if (code > dictSize || (code == dictSize && prevCode < 0)) return null
        var sp = 0
        var cur = code
        var firstByte = 0
        if (code == dictSize) {
          // KwKwK case: emit prev's expansion + its first byte
          stack(sp) = firstByteOfPrev.toByte; sp += 1
          cur = prevCode
        }
        while (cur >= clear + 2) { // chain through composite codes
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp > 4096) return null
        }
        firstByte = cur // a literal code IS its byte value
        stack(sp) = cur.toByte; sp += 1
        while (sp > 0 && outLen < nPixels) {
          sp -= 1; out(outLen) = stack(sp); outLen += 1
        }
        if (prevCode >= 0 && dictSize < 4096) {
          prefix(dictSize) = prevCode
          suffix(dictSize) = firstByte.toByte
          dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prevCode = code
        firstByteOfPrev = firstByte
      }
    }
    out
  }

  def ahash(b: Array[Byte]): java.lang.Long = {
    val img = decodeLuma(b)
    if (img == null) null
    else java.lang.Long.valueOf(AHashKernel.ahash(img._1, img._2, img._3))
  }
}

/** Deterministic GIF synthesis for goldens/oracles (mirrors [[BmpSynth]]).
  * Emits the classic "uncompressed LZW" encoding — every pixel as a
  * literal code with a CLEAR before the dictionary could grow past the
  * initial width — which every conformant decoder accepts.
  */
object GifSynth {

  /** GIF89a with a global color table holding the image's distinct colors
    * (≤ 256); `rgb(x, y)` returns 0xRRGGBB.
    */
  def gif(w: Int, h: Int, interlacedFlag: Boolean = false)
         (rgb: (Int, Int) => Int): Array[Byte] = {
    val pixels = Array.tabulate(h, w)((y, x) => rgb(x, y) & 0xFFFFFF)
    val colors = pixels.flatten.distinct.sorted
    require(colors.length <= 256, "GIF palette overflow")
    val index = colors.zipWithIndex.toMap
    // palBits is the descriptor field: table size = 2^(palBits+1)
    var palBits = 1
    while ((2 << palBits) < colors.length && palBits < 7) palBits += 1
    val palSize = 2 << palBits
    val out = collection.mutable.ArrayBuffer[Byte]()
    out ++= "GIF89a".getBytes("US-ASCII")
    out += (w & 0xFF).toByte; out += ((w >> 8) & 0xFF).toByte
    out += (h & 0xFF).toByte; out += ((h >> 8) & 0xFF).toByte
    out += (0x80 | palBits).toByte; out += 0; out += 0
    for (i <- 0 until palSize) {
      val c = if (i < colors.length) colors(i) else 0
      out += ((c >> 16) & 0xFF).toByte
      out += ((c >> 8) & 0xFF).toByte
      out += (c & 0xFF).toByte
    }
    // image descriptor (no local table); interlaced output emits rows in
    // the four-pass order so the decoder's de-interlace map is exercised
    out += 0x2C.toByte
    out += 0; out += 0; out += 0; out += 0
    out += (w & 0xFF).toByte; out += ((w >> 8) & 0xFF).toByte
    out += (h & 0xFF).toByte; out += ((h >> 8) & 0xFF).toByte
    out += (if (interlacedFlag) 0x40 else 0x00).toByte
    // LZW, uncompressed style: 8-bit min code, CLEAR every 254 literals
    val minCode = 8
    val clear = 1 << minCode; val eoi = clear + 1; val width = minCode + 1
    out += minCode.toByte
    val bits = collection.mutable.ArrayBuffer[Byte]()
    var acc = 0L; var nAcc = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bits += (acc & 0xFF).toByte; acc >>= 8; nAcc -= 8 }
    }
    emit(clear)
    var sinceClear = 0
    val rowOrder: Seq[Int] =
      if (!interlacedFlag) 0 until h
      else (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)
    for (y <- rowOrder; p <- pixels(y)) {
      if (sinceClear == 254) { emit(clear); sinceClear = 0 }
      emit(index(p)); sinceClear += 1
    }
    emit(eoi)
    if (nAcc > 0) bits += (acc & 0xFF).toByte
    var i = 0
    while (i < bits.length) {
      val n = math.min(255, bits.length - i)
      out += n.toByte
      out ++= bits.slice(i, i + n)
      i += n
    }
    out += 0 // block terminator
    out += 0x3B.toByte
    out.toArray
  }

  /** The three analytic oracle patterns, pixel-identical to
    * [[BmpSynth.OraclePatterns]] → same closed-form hashes.
    */
  val OraclePatterns: IndexedSeq[Array[Byte]] = IndexedSeq(
    gif(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF),
    gif(8, 8)((_, y) => if (y < 4) 0x000000 else 0xFFFFFF),
    gif(8, 8)((_, _) => 0x808080))
}
