package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL pixel-level decode for non-interlaced 8-bit PNGs → the same pinned
  * 8×8 mean-threshold average-hash kernel as [[BmpAHash]] (reference kernel
  * image-deduper `src/processing/core.rs:37-104`; PNG path
  * `src/formats/png.rs:9-23`). Everything here is JDK-only: IDAT inflate is
  * `java.util.zip.Inflater`, unfiltering (None/Sub/Up/Average/Paeth) is
  * integer byte arithmetic — no codec dependency.
  *
  * Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
  * 4 (gray+alpha), 6 (RGBA), interlace 0. Alpha is ignored for luma (the
  * hash is a content fingerprint; premultiplying would make visually
  * identical blobs hash apart on alpha-channel noise).
  *
  * Corrupt-input contract mirrors [[BmpAHash]]: malformed, truncated,
  * interlaced, 16-bit, or zip-bombed bytes return null, never throw (S9).
  */
object PngPixels {

  /** Tiered-cost bound (X12): a PNG is DEFLATE-compressed, so a tiny blob
    * can legally describe a huge raster (decompression bomb). Cap the
    * decoded pixel count — 16.7M px ≈ 4096², raw RGBA buffer ≤ 67 MB —
    * anything larger is hostile input for a fingerprinting pass and
    * returns null like any other undecodable blob.
    */
  val MaxPixels: Long = 1L << 24

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (0 until 8).forall(i => b(i) == Signature(i))

  private def paeth(a: Int, bb: Int, c: Int): Int = {
    val p = a + bb - c
    val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
  }

  /** Decode to (width, height, row-major luma bytes); null when not a
    * supported, well-formed PNG.
    */
  def decodeLuma(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (!isPng(b)) return null
    try {
      // ── chunk walk: IHDR geometry, optional PLTE, concatenated IDAT ──
      var off = 8
      var w = 0; var h = 0; var colorType = -1
      var palette: Array[Byte] = null
      var idat = new Array[Byte](0); var idatLen = 0
      var sawIhdr = false; var sawIend = false
      while (off + 8 <= b.length && !sawIend) {
        val len = be32(b, off)
        if (len < 0 || off + 12L + len > b.length) return null
        val ctype = new String(b, off + 4, 4, "US-ASCII")
        val data = off + 8
        ctype match {
          case "IHDR" =>
            if (len < 13) return null
            w = be32(b, data); h = be32(b, data + 4)
            val depth = u8(b, data + 8)
            colorType = u8(b, data + 9)
            val compression = u8(b, data + 10)
            val filterMethod = u8(b, data + 11)
            val interlace = u8(b, data + 12)
            if (depth != 8 || compression != 0 || filterMethod != 0 || interlace != 0)
              return null
            if (!Set(0, 2, 3, 4, 6).contains(colorType)) return null
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
            sawIhdr = true
          case "PLTE" =>
            if (len % 3 != 0) return null
            palette = java.util.Arrays.copyOfRange(b, data, data + len)
          case "IDAT" =>
            if (!sawIhdr) return null
            if (idat.length < idatLen + len) {
              val grown = new Array[Byte](math.max(idat.length * 2, idatLen + len))
              System.arraycopy(idat, 0, grown, 0, idatLen)
              idat = grown
            }
            System.arraycopy(b, data, idat, idatLen, len)
            idatLen += len
          case "IEND" => sawIend = true
          case _ => () // ancillary chunks: skip (CRC not validated — lenient)
        }
        off += 12 + len
      }
      if (!sawIhdr || idatLen == 0) return null
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      }
      if (colorType == 3 && palette == null) return null

      // ── inflate exactly h filtered scanlines ──
      val rowBytes = w * channels
      val raw = new Array[Byte]((1 + rowBytes) * h)
      val inf = new Inflater()
      inf.setInput(idat, 0, idatLen)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // Output space is guaranteed by the loop condition, so n == 0 can only
        // mean needsInput (truncated stream) or needsDictionary (FDICT preset
        // dictionary, which PNG forbids and we cannot supply) — both are
        // undecodable; looping again would spin forever on the FDICT case.
        if (n == 0) { inf.end(); return null }
        got += n
      }
      inf.end()
      if (got < raw.length) return null

      // ── unfilter + luma, row by row (prev = reconstructed prior row) ──
      val luma = new Array[Byte](w * h)
      val cur = new Array[Int](rowBytes)
      val prev = new Array[Int](rowBytes)
      var y = 0
      while (y < h) {
        val rowOff = y * (1 + rowBytes)
        val ft = u8(raw, rowOff)
        if (ft > 4) return null
        var i = 0
        while (i < rowBytes) {
          val x = u8(raw, rowOff + 1 + i)
          val a = if (i >= channels) cur(i - channels) else 0
          val up = if (y > 0) prev(i) else 0
          val c = if (y > 0 && i >= channels) prev(i - channels) else 0
          cur(i) = (ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + up
            case 3 => x + ((a + up) >> 1)
            case 4 => x + paeth(a, up, c)
          }) & 0xFF
          i += 1
        }
        var px = 0
        while (px < w) {
          val p = px * channels
          val lum = colorType match {
            case 0 | 4 => cur(p)
            case 2 | 6 => (299 * cur(p) + 587 * cur(p + 1) + 114 * cur(p + 2)) / 1000
            case 3 =>
              val pi = cur(p) * 3
              if (pi + 2 >= palette.length) return null
              (299 * u8(palette, pi) + 587 * u8(palette, pi + 1) +
                114 * u8(palette, pi + 2)) / 1000
          }
          luma(y * w + px) = lum.toByte
          px += 1
        }
        System.arraycopy(cur, 0, prev, 0, rowBytes)
        y += 1
      }
      (w, h, luma)
    } catch { case _: Exception => null }
  }

  /** null (boxed) when not a decodable PNG; otherwise the pinned kernel. */
  def ahash(b: Array[Byte]): java.lang.Long = {
    val img = decodeLuma(b)
    if (img == null) null
    else java.lang.Long.valueOf(AHashKernel.ahash(img._1, img._2, img._3))
  }
}

/** The pinned 8×8 mean-threshold kernel over a decoded row-major luma
  * raster — byte-for-byte the same arithmetic as [[BmpAHash]]'s fused loop
  * (goldens and the SQL oracles depend on it):
  * integer Rec.601 luma upstream, 8×8 box mean with floor cell bounds
  * (degenerate cells widen to ≥1 px), strict `>` global-mean threshold,
  * bit (63 − (cy·8 + cx)).
  */
private[multimodal] object AHashKernel {

  def ahash(w: Int, h: Int, luma: Array[Byte]): Long = {
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var y = y0
      while (y < y1) {
        var cx = 0
        while (cx < 8) {
          val x0 = cx * w / 8
          val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
          var s = 0L
          var x = x0
          while (x < x1) { s += luma(y * w + x) & 0xFF; x += 1 }
          val cell = cy * 8 + cx
          sums(cell) += s
          counts(cell) += (x1 - x0)
          cx += 1
        }
        y += 1
      }
      cy += 1
    }
    var total = 0L; var totalN = 0L; var i = 0
    while (i < 64) { total += sums(i); totalN += counts(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (sums(i) * totalN > total * counts(i)) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }
}

/** Deterministic PNG synthesis — fixture generator for the PNG aHash oracle
  * query and the filter round-trip goldens (mirrors [[BmpSynth]] /
  * reference `processing_tests.rs:93-119`). Encodes real zlib streams via
  * `java.util.zip.Deflater` with correct CRCs, so the output is a valid
  * PNG any decoder accepts.
  */
object PngSynth {

  private def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    def be32(i: Int, v: Int): Unit = {
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
    }
    be32(0, data.length)
    for (i <- 0 until 4) out(4 + i) = ctype.charAt(i).toByte
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32()
    crc.update(out, 4, 4 + data.length)
    be32(8 + data.length, crc.getValue.toInt)
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** 8-bit non-interlaced PNG; `rgb(x, y)` returns 0xRRGGBB. `colorType`
    * ∈ {0 gray, 2 RGB, 3 palette, 6 RGBA}; `filterFor(y)` picks the
    * scanline filter (0–4) actually APPLIED during encode, so decoders
    * must reverse it.
    */
  def png(w: Int, h: Int, colorType: Int = 2,
          filterFor: Int => Int = _ => 0)(rgb: (Int, Int) => Int): Array[Byte] = {
    require(Set(0, 2, 3, 6).contains(colorType), "synth supports gray/RGB/palette/RGBA")
    val channels = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 6 => 4 }
    val paletteColors: IndexedSeq[Int] =
      if (colorType == 3) {
        val cs = (for (y <- 0 until h; x <- 0 until w) yield rgb(x, y) & 0xFFFFFF)
          .distinct.sorted
        require(cs.length <= 256, "PNG palette overflow")
        cs
      } else IndexedSeq.empty
    val paletteIndex = paletteColors.zipWithIndex.toMap
    val rowBytes = w * channels
    val raw = new Array[Int](rowBytes)
    val prev = new Array[Int](rowBytes)
    val scan = new Array[Byte]((1 + rowBytes) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        val p = x * channels
        colorType match {
          case 0 =>
            raw(p) = (299 * ((c >> 16) & 0xFF) + 587 * ((c >> 8) & 0xFF) +
              114 * (c & 0xFF)) / 1000
          case 3 =>
            raw(p) = paletteIndex(c & 0xFFFFFF)
          case 2 | 6 =>
            raw(p) = (c >> 16) & 0xFF; raw(p + 1) = (c >> 8) & 0xFF; raw(p + 2) = c & 0xFF
            if (channels == 4) raw(p + 3) = 0xFF
        }
        x += 1
      }
      val ft = filterFor(y)
      val off = y * (1 + rowBytes)
      scan(off) = ft.toByte
      var i = 0
      while (i < rowBytes) {
        val a = if (i >= channels) raw(i - channels) else 0
        val up = if (y > 0) prev(i) else 0
        val cc = if (y > 0 && i >= channels) prev(i - channels) else 0
        val f = ft match {
          case 0 => raw(i)
          case 1 => raw(i) - a
          case 2 => raw(i) - up
          case 3 => raw(i) - ((a + up) >> 1)
          case 4 => raw(i) - paeth(a, up, cc)
        }
        scan(off + 1 + i) = (f & 0xFF).toByte
        i += 1
      }
      System.arraycopy(raw, 0, prev, 0, rowBytes)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(scan); deflater.finish()
    // drain into a growable sink (TiffSynth.deflate pattern): a fixed
    // scan.length + 64 buffer under-provisions for incompressible pixels
    // (stored-block overhead is ~5 bytes per 64 KB) and the drain loop
    // would spin on a full buffer
    val zOut = new java.io.ByteArrayOutputStream(scan.length / 2 + 64)
    val zBuf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(zBuf, 0, zBuf.length)
      if (n > 0) zOut.write(zBuf, 0, n)
    }
    deflater.end()
    val ihdr = new Array[Byte](13)
    def be32(arr: Array[Byte], i: Int, v: Int): Unit = {
      arr(i) = (v >>> 24).toByte; arr(i + 1) = (v >>> 16).toByte
      arr(i + 2) = (v >>> 8).toByte; arr(i + 3) = v.toByte
    }
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    val plte =
      if (colorType == 3) {
        val p = new Array[Byte](paletteColors.length * 3)
        for ((c, i) <- paletteColors.zipWithIndex) {
          p(i * 3) = ((c >> 16) & 0xFF).toByte
          p(i * 3 + 1) = ((c >> 8) & 0xFF).toByte
          p(i * 3 + 2) = (c & 0xFF).toByte
        }
        chunk("PLTE", p)
      } else new Array[Byte](0)
    PngPixels.Signature ++ chunk("IHDR", ihdr) ++ plte ++
      chunk("IDAT", zOut.toByteArray) ++
      chunk("IEND", new Array[Byte](0))
  }

  /** The three analytically-hashable oracle patterns (pattern = doc_id % 3),
    * pixel-identical to [[BmpSynth.OraclePatterns]] so the expected hashes
    * are the same closed forms.
    */
  val OraclePatterns: IndexedSeq[Array[Byte]] = IndexedSeq(
    png(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF),
    png(8, 8)((_, y) => if (y < 4) 0x000000 else 0xFFFFFF),
    png(8, 8)((_, _) => 0x808080))
}

/** Format dispatch for the `image_ahash` expression: route by magic bytes
  * to the per-format pixel decoder (BMP/PNG/GIF hand-rolled, JPEG via the
  * JDK's ImageIO plugin), null for anything malformed or unsupported.
  */
object PixelAHash {

  def ahash(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 8) null
    else if (b(0) == 'B' && b(1) == 'M') BmpAHash.ahash(b)
    else if (PngPixels.isPng(b)) PngPixels.ahash(b)
    else if (GifPixels.isGif(b)) GifPixels.ahash(b)
    else if (JpegPixels.isJpeg(b)) JpegPixels.ahash(b)
    else if (TiffPixels.isTiff(b)) TiffPixels.ahash(b)
    else null
  }
}
