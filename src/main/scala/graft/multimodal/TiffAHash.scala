package graft.multimodal

/** REAL pixel-level decode for uncompressed baseline TIFFs → the same
  * pinned 8×8 mean-threshold kernel ([[AHashKernel]]) as the other four
  * containers. The reference treats TIFF as first-class (image-deduper
  * `src/formats/tiff.rs:9-24`, with dedicated timeout tiers
  * `src/timeout_utils.rs:33,47`); here the container walk is pure-JVM byte
  * code in [[ImageHeader]]'s style.
  *
  * A TIFF is a header (byte order `II`/`MM`, magic 42, IFD offset) plus a
  * chain of IFDs: count, then 12-byte entries (tag, type, count,
  * value-or-offset), everything in the declared byte order. Dimension
  * decode (tags 256/257) works for ANY compression — it never touches
  * pixel data. Pixel decode supports the baseline profile: Compression 1
  * (none), 8/32946 (zlib Deflate, via the JDK Inflater per strip), or
  * 32773 (PackBits RLE); 8 bits per sample; PhotometricInterpretation 0/1
  * (grayscale, either polarity) or 2 (RGB); chunky planar config;
  * strip-organized (tags 273/278/279), each strip independently encoded.
  *
  * Corrupt-input contract mirrors the other decoders (S9): malformed,
  * truncated, unsupported, or bomb-sized bytes return null, never throw.
  */
object TiffPixels {

  /** Tiered-cost bound (X12): an 8-byte header can declare any geometry,
    * so the decoded pixel count is capped before any allocation. The ONE
    * shared cap — GIF and JPEG reference it too, so tightening it in
    * PngPixels covers every container.
    */
  val MaxPixels: Long = PngPixels.MaxPixels

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  def isTiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 &&
      ((u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0) ||
       (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 42))

  /** One parsed IFD entry value set — only the tags the decoder consumes. */
  private final class Ifd {
    var width = -1; var height = -1
    var compression = 1            // default per spec
    var photometric = -1
    var samplesPerPixel = 1        // default per spec
    var bitsPerSample: Array[Long] = Array(8L) // default per spec
    var rowsPerStrip = Long.MaxValue // default: one strip of all rows
    var planar = 1                 // chunky default
    var stripOffsets: Array[Long] = null
    var stripByteCounts: Array[Long] = null
  }

  private val TypeSizes = Array(0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8)

  /** Walk IFD0, endian-aware; null on any structural violation. */
  private def readIfd0(b: Array[Byte]): Ifd = {
    if (!isTiff(b)) return null
    val le = u8(b, 0) == 'I'
    def r16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) u8(b, i) | (u8(b, i + 1) << 8)
      else (u8(b, i) << 8) | u8(b, i + 1)
    def r32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
        (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
      else ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
        u8(b, i + 3)) & 0xFFFFFFFFL

    val ifdOff = r32(4)
    if (ifdOff < 8 || ifdOff + 2 > b.length) return null
    val n = r16(ifdOff.toInt)
    if (n <= 0 || n > 512) return null
    val base = ifdOff.toInt + 2
    if (base + 12L * n > b.length) return null

    // entry values: SHORT(3)/LONG(4) scalars or arrays; values whose byte
    // size ≤ 4 are inline in the value field, larger ones live at offset
    def values(entry: Int): Array[Long] = {
      val tpe = r16(entry + 2)
      val cnt = r32(entry + 4)
      if (tpe != 3 && tpe != 4) return null
      if (cnt <= 0 || cnt > 65536) return null
      val sz = TypeSizes(tpe)
      val total = sz * cnt
      val at = if (total <= 4) entry + 8 else r32(entry + 8).toInt
      if (at < 0 || at + total > b.length) return null
      Array.tabulate(cnt.toInt) { k =>
        if (tpe == 3) r16(at + 2 * k).toLong else r32(at + 4 * k)
      }
    }

    val ifd = new Ifd
    var e = 0
    while (e < n) {
      val entry = base + 12 * e
      val tag = r16(entry)
      tag match {
        case 256 | 257 | 258 | 259 | 262 | 273 | 277 | 278 | 279 | 284 =>
          val v = values(entry)
          if (v == null || v.isEmpty) return null
          tag match {
            case 256 => ifd.width = v(0).toInt
            case 257 => ifd.height = v(0).toInt
            case 258 => ifd.bitsPerSample = v
            case 259 => ifd.compression = v(0).toInt
            case 262 => ifd.photometric = v(0).toInt
            case 273 => ifd.stripOffsets = v
            case 277 => ifd.samplesPerPixel = v(0).toInt
            case 278 => ifd.rowsPerStrip = v(0)
            case 279 => ifd.stripByteCounts = v
            case 284 => ifd.planar = v(0).toInt
          }
        case _ => () // ancillary tags: skip (lenient, like PNG chunks)
      }
      e += 1
    }
    if (ifd.width <= 0 || ifd.height <= 0) return null
    ifd
  }

  /** Header-only dimension decode — valid for any compression scheme. */
  def dimensions(b: Array[Byte]): (Int, Int) = {
    try {
      val ifd = readIfd0(b)
      if (ifd == null) null else (ifd.width, ifd.height)
    } catch { case _: Exception => null }
  }

  /** Decode to (width, height, row-major luma); null when not a supported,
    * well-formed baseline TIFF (uncompressed, Deflate, or PackBits strips).
    */
  def decodeLuma(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    try {
      val ifd = readIfd0(b)
      if (ifd == null) return null
      val w = ifd.width; val h = ifd.height
      if (w.toLong * h > MaxPixels) return null
      // 1 = uncompressed, 8/32946 = zlib Deflate, 32773 = PackBits RLE
      if (!Set(1, 8, 32946, 32773).contains(ifd.compression)) return null
      if (ifd.planar != 1) return null               // chunky only
      val spp = ifd.samplesPerPixel
      val gray = ifd.photometric == 0 || ifd.photometric == 1
      val rgb = ifd.photometric == 2
      // spp is part of the bomb surface too: MaxPixels caps w*h, but the
      // strip buffers scale with w*h*spp — a crafted header declaring
      // spp=120 would demand a ~2 GB allocation (and the OutOfMemoryError
      // is an Error, outside the S9 catch). Baseline RGB is 3, +1 for an
      // alpha/extra sample; anything beyond is out of the supported
      // profile, same verdict as an exotic compression scheme.
      if (!(gray && spp == 1) && !(rgb && (spp == 3 || spp == 4))) return null
      if (ifd.bitsPerSample.length < spp || ifd.bitsPerSample.exists(_ != 8L))
        return null
      if (ifd.stripOffsets == null) return null
      val counts = if (ifd.stripByteCounts != null) ifd.stripByteCounts
        // spec requires 279, but a single uncompressed strip is recoverable
        else if (ifd.stripOffsets.length == 1 && ifd.compression == 1)
          Array(w.toLong * h * spp)
        else return null
      if (counts.length != ifd.stripOffsets.length) return null
      val rps = if (ifd.rowsPerStrip <= 0) return null
        else math.min(ifd.rowsPerStrip, h.toLong)
      val nStrips = ((h + rps - 1) / rps).toInt
      if (ifd.stripOffsets.length < nStrips) return null

      val rowBytes = w * spp
      val luma = new Array[Byte](w * h)
      // invert = photometric 0 (WhiteIsZero): 0 means white
      val invert = ifd.photometric == 0
      var s = 0
      while (s < nStrips) {
        val y0 = s * rps
        val rows = math.min(rps, h - y0).toInt
        val need = rows * rowBytes
        val off = ifd.stripOffsets(s)
        val cnt = counts(s)
        if (off < 0 || cnt < 0 || off + cnt > b.length) return null
        // per-strip source bytes: direct view for compression 1, otherwise
        // decompressed into a strip-sized buffer (strips are independently
        // compressed per the spec)
        val (data, base) = ifd.compression match {
          case 1 =>
            if (cnt < need) return null
            (b, off.toInt)
          case 8 | 32946 =>
            val out = inflateExact(b, off.toInt, cnt.toInt, need)
            if (out == null) return null
            (out, 0)
          case 32773 =>
            val out = unpackBits(b, off.toInt, cnt.toInt, need)
            if (out == null) return null
            (out, 0)
        }
        var r = 0
        while (r < rows) {
          val y = (y0 + r).toInt
          val src = base + r * rowBytes
          var x = 0
          while (x < w) {
            val p = src + x * spp
            val lum =
              if (spp == 1) u8(data, p)
              else (299 * u8(data, p) + 587 * u8(data, p + 1) +
                114 * u8(data, p + 2)) / 1000
            luma(y * w + x) = (if (invert) 255 - lum else lum).toByte
            x += 1
          }
          r += 1
        }
        s += 1
      }
      (w, h, luma)
    } catch { case _: Exception => null }
  }

  /** Inflate exactly `need` bytes from b[off, off+len); null on anything
    * else — truncated stream, FDICT preset dictionary (zero-progress
    * guard, same rationale as the PNG decoder), or a strip that decodes
    * short.
    */
  private def inflateExact(b: Array[Byte], off: Int, len: Int,
                           need: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, off, len)
    val out = new Array[Byte](need)
    var got = 0
    while (got < need && !inf.finished()) {
      val n = inf.inflate(out, got, need - got)
      if (n == 0) { inf.end(); return null } // no progress: undecodable
      got += n
    }
    inf.end()
    if (got < need) null else out
  }

  /** TIFF PackBits (the spec's RLE): control n in [0,127] copies n+1
    * literals, n in [-127,-1] repeats the next byte 1-n times, -128 is a
    * noop. Exactly `need` output bytes or null.
    */
  private def unpackBits(b: Array[Byte], off: Int, len: Int,
                         need: Int): Array[Byte] = {
    val out = new Array[Byte](need)
    var i = off; val end = off + len
    var o = 0
    while (o < need && i < end) {
      val n = b(i); i += 1
      if (n >= 0) {
        val run = n + 1
        if (i + run > end || o + run > need) return null
        System.arraycopy(b, i, out, o, run)
        i += run; o += run
      } else if (n != -128) {
        val run = 1 - n
        if (i >= end || o + run > need) return null
        java.util.Arrays.fill(out, o, o + run, b(i))
        i += 1; o += run
      } // -128: noop
    }
    if (o < need) null else out
  }

  /** null (boxed) when not a decodable baseline TIFF (uncompressed,
    * Deflate, or PackBits).
    */
  def ahash(b: Array[Byte]): java.lang.Long = {
    val img = decodeLuma(b)
    if (img == null) null
    else java.lang.Long.valueOf(AHashKernel.ahash(img._1, img._2, img._3))
  }
}

/** Deterministic TIFF synthesizer for tests and closed-form oracles, in
  * [[BmpSynth]]'s style: baseline uncompressed, both byte orders, gray or
  * RGB, strip-organized.
  */
object TiffSynth {

  /** Per-strip Deflate encode (TIFF compression 8). */
  private def deflate(chunk: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(chunk); d.finish()
    val buf = new Array[Byte](chunk.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Per-strip PackBits encode (TIFF compression 32773): repeat runs ≥ 3
    * become repeats, everything else literal chunks of ≤ 128.
    */
  private def packBits(chunk: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < chunk.length) {
      var run = 1
      while (i + run < chunk.length && run < 128 && chunk(i + run) == chunk(i)) run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(chunk(i)); i += run
      } else {
        var lit = i + run // extend literal until the next ≥3 repeat
        while (lit < chunk.length && lit - i < 128 &&
          !(lit + 2 < chunk.length && chunk(lit) == chunk(lit + 1) &&
            chunk(lit) == chunk(lit + 2))) lit += 1
        out.write(lit - i - 1); out.write(chunk, i, lit - i); i = lit
      }
    }
    out.toByteArray
  }

  /** `rgb(x, y)` returns 0xRRGGBB. `gray = true` writes one Rec.601 luma
    * sample per pixel (photometric 1); otherwise chunky RGB (photometric
    * 2). `rowsPerStrip` exercises the multi-strip path; `compression`
    * ∈ {1 none, 8 Deflate, 32773 PackBits} encodes each strip
    * independently, as the spec requires.
    */
  def tiff(w: Int, h: Int, gray: Boolean = false, littleEndian: Boolean = true,
           rowsPerStrip: Int = Int.MaxValue, compression: Int = 1)
          (rgb: (Int, Int) => Int): Array[Byte] = {
    require(Set(1, 8, 32773).contains(compression), "synth: none/deflate/packbits")
    val spp = if (gray) 1 else 3
    val rowBytes = w * spp
    val rps = math.min(rowsPerStrip, h)
    val nStrips = (h + rps - 1) / rps
    // raw raster, then per-strip encode
    val raw = new Array[Byte](rowBytes * h)
    for (y <- 0 until h; x <- 0 until w) {
      val c = rgb(x, y)
      val p = y * rowBytes + x * spp
      if (gray)
        raw(p) = ((299 * ((c >> 16) & 0xFF) + 587 * ((c >> 8) & 0xFF) +
          114 * (c & 0xFF)) / 1000).toByte
      else {
        raw(p) = ((c >> 16) & 0xFF).toByte
        raw(p + 1) = ((c >> 8) & 0xFF).toByte
        raw(p + 2) = (c & 0xFF).toByte
      }
    }
    val strips: IndexedSeq[Array[Byte]] = (0 until nStrips).map { s =>
      val chunk = java.util.Arrays.copyOfRange(raw, s * rps * rowBytes,
        math.min((s + 1) * rps, h) * rowBytes)
      compression match {
        case 1 => chunk
        case 8 => deflate(chunk)
        case 32773 => packBits(chunk)
      }
    }
    // layout: 8-byte header | encoded strips | IFD | out-of-line arrays
    val pixAt = 8
    val ifdAt = pixAt + strips.map(_.length).sum
    val tags = Seq(256, 257, 258, 259, 262, 273, 277, 278, 279)
    val nE = tags.length
    val ifdBytes = 2 + 12 * nE + 4
    var extraAt = ifdAt + ifdBytes // out-of-line array area
    val out = new java.io.ByteArrayOutputStream()
    val buf = new java.io.DataOutputStream(out)
    def w16(v: Int): Unit =
      if (littleEndian) { buf.write(v & 0xFF); buf.write((v >> 8) & 0xFF) }
      else { buf.write((v >> 8) & 0xFF); buf.write(v & 0xFF) }
    def w32(v: Long): Unit =
      if (littleEndian) { buf.write((v & 0xFF).toInt); buf.write(((v >> 8) & 0xFF).toInt)
        buf.write(((v >> 16) & 0xFF).toInt); buf.write(((v >> 24) & 0xFF).toInt) }
      else { buf.write(((v >> 24) & 0xFF).toInt); buf.write(((v >> 16) & 0xFF).toInt)
        buf.write(((v >> 8) & 0xFF).toInt); buf.write((v & 0xFF).toInt) }

    // header
    buf.write(if (littleEndian) 'I' else 'M'); buf.write(if (littleEndian) 'I' else 'M')
    if (littleEndian) { buf.write(42); buf.write(0) } else { buf.write(0); buf.write(42) }
    w32(ifdAt)
    strips.foreach(buf.write)
    // IFD entries, ascending tag order as the spec requires
    val stripOffs = strips.scanLeft(pixAt.toLong)(_ + _.length).dropRight(1)
    val stripCnts = strips.map(_.length.toLong)
    val extras = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Long])]
    def entry(tag: Int, tpe: Int, vals: Seq[Long]): Unit = {
      w16(tag); w16(tpe); w32(vals.length)
      val unit = if (tpe == 3) 2 else 4
      val sz = unit * vals.length
      if (sz <= 4) { // inline, padded
        if (tpe == 3) { w16(vals.head.toInt); if (vals.length > 1) w16(vals(1).toInt) else w16(0) }
        else w32(vals.head)
      } else { w32(extraAt); extras += ((tpe, vals)); extraAt += unit * vals.length }
    }
    w16(nE)
    entry(256, 4, Seq(w.toLong))
    entry(257, 4, Seq(h.toLong))
    entry(258, 3, Seq.fill(spp)(8L))
    entry(259, 3, Seq(compression.toLong))
    entry(262, 3, Seq(if (gray) 1L else 2L))
    entry(273, 4, stripOffs)
    entry(277, 3, Seq(spp.toLong))
    entry(278, 4, Seq(rps.toLong))
    entry(279, 4, stripCnts)
    w32(0) // next-IFD terminator
    // out-of-line arrays, in claim order, at their promised offsets
    extras.foreach { case (tpe, vals) =>
      vals.foreach(v => if (tpe == 3) w16(v.toInt) else w32(v))
    }
    buf.flush()
    out.toByteArray
  }

  /** The three analytic 8×8 patterns shared with [[BmpSynth]] (identical
    * pixels → identical closed-form hashes; only the container differs).
    * Encodings rotate through little-endian RGB uncompressed, big-endian
    * RGB Deflate-compressed, and grayscale PackBits so both byte orders,
    * both photometric modes, and all three compression schemes sit on the
    * oracle path.
    */
  val OraclePatterns: IndexedSeq[Array[Byte]] = IndexedSeq(
    tiff(8, 8)((x, _) => if (x < 4) 0x000000 else 0xFFFFFF),
    tiff(8, 8, littleEndian = false, compression = 8)(
      (_, y) => if (y < 4) 0x000000 else 0xFFFFFF),
    tiff(8, 8, gray = true, compression = 32773)((_, _) => 0x808080))
}
