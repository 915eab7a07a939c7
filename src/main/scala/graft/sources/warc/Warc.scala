package graft.sources.warc

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/1.0 (ISO 28500) record stream parser + fixture writer.
  *
  * This is the crawl-native ingest seam: Common Crawl publishes its pages
  * as `.warc.gz` files where EVERY record is its own gzip member, so a
  * whole-file `GZIPInputStream` (which transparently chains concatenated
  * members) decodes the file as one continuous record stream. The parser
  * is pure JVM and pure function-of-bytes — no Spark types — so it is
  * unit-testable without a session and reusable from any partition reader.
  *
  * Reference analog: the filesystem discovery + per-format decode front
  * door (image-deduper `crates/core/src/discovery/mod.rs:16-109`,
  * `file_processing.rs:15-41`) — there the corpus arrives as image files
  * on disk; for Common-Crawl-style web text it arrives as WARC containers,
  * and this module plays the same "bytes on storage → typed rows" role.
  *
  * Corrupt-input posture matches the engine's decoders (S9): in lenient
  * mode a structurally broken record stops the FILE's iteration (returning
  * every record parsed before the corruption) rather than throwing — a
  * mid-stream length corruption leaves no trustworthy resync point inside
  * a decompressed gzip stream, and one bad container must never kill a
  * 100k-file ingest job. `strict = true` throws instead, for validation
  * runs.
  */
object Warc {

  /** One parsed WARC record. `block` is the raw record block (for
    * `response` records: the full HTTP response message, status line +
    * headers + body).
    */
  final case class Record(
      recType: String,
      targetUri: String,
      dateMicros: java.lang.Long,
      contentType: String,
      block: Array[Byte],
      index: Long)

  /** HTTP response message split out of a response record's block. */
  final case class HttpPayload(status: java.lang.Integer, contentType: String, body: Array[Byte])

  /** Max accepted header-line bytes. Real WARC headers are < 1 KB; a
    * "line" beyond this means the stream has no newline where one belongs
    * (bit-flipped length, binary garbage) and buffering on toward a
    * full-stream StringBuilder would OOM — treated as corruption.
    */
  val MaxHeaderLineBytes: Int = 64 * 1024

  /** Max accepted record block. Common-Crawl response records are capped
    * around 1 MB; 64 MB is generous for any legitimate container. Beyond
    * it the Content-Length is corrupt/hostile and must not drive the
    * allocation — an OutOfMemoryError is an Error, which the lenient
    * catch (Exceptions only) could never contain.
    */
  val MaxRecordBytes: Long = 64L * 1024 * 1024

  private[warc] def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (buf.size() >= MaxHeaderLineBytes)
        throw new EOFException("WARC header line exceeds 64 KiB — corrupt stream")
      buf.write(c)
      c = in.read()
    }
    val bytes = buf.toByteArray
    val n = if (bytes.length > 0 && bytes(bytes.length - 1) == '\r')
      bytes.length - 1 else bytes.length
    // WARC/1.0 header values are UTF-8 (ISO 28500 §5.1) — a per-byte char
    // cast would mojibake every non-ASCII WARC-Target-URI into a silently
    // wrong url key
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  /** Streaming record iterator over one (already decompression-wrapped)
    * WARC byte stream. Not thread-safe; single-pass.
    */
  final class RecordIterator(in: InputStream, strict: Boolean) extends Iterator[Record] {
    private var nextRec: Record = _
    private var done = false
    private var idx = 0L

    private def fail(msg: String): Null = {
      if (strict) throw new EOFException(msg)
      done = true
      null
    }

    // gzip-level corruption (half-written member, bad CRC) surfaces as a
    // ZipException or EOFException from the decompressor mid-read — in
    // lenient mode that is the same "corrupt tail" case as a chopped
    // record: keep the intact prefix, stop the file. ONLY decode errors
    // qualify: a transient transport IOException (socket reset, HDFS
    // hiccup) must still fail the task so Spark retries it — swallowing
    // those would silently truncate containers on a flaky network
    private def advance(): Record =
      try advanceImpl()
      catch {
        case e @ (_: java.util.zip.ZipException | _: EOFException) =>
          if (strict) throw e
          done = true
          null
      }

    private def advanceImpl(): Record = {
      // skip inter-record blank lines (the record terminator CRLFCRLF)
      var line = readLine(in)
      while (line != null && line.isEmpty) line = readLine(in)
      if (line == null) { done = true; return null }
      if (!line.startsWith("WARC/"))
        return fail(s"expected WARC version line, got: ${line.take(64)}")
      var recType: String = null
      var uri: String = null
      var date: java.lang.Long = null
      var ctype: String = null
      var len = -1L
      line = readLine(in)
      while (line != null && line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val k = line.substring(0, colon).trim.toLowerCase
          val v = line.substring(colon + 1).trim
          k match {
            case "warc-type"       => recType = v.toLowerCase
            case "warc-target-uri" =>
              // pre-1.1 writers angle-bracket the URI
              uri = if (v.length >= 2 && v.charAt(0) == '<' && v.charAt(v.length - 1) == '>')
                v.substring(1, v.length - 1) else v
            case "warc-date" =>
              date = try {
                val inst = Instant.parse(v)
                java.lang.Long.valueOf(inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
              } catch { case _: Exception => if (strict) throw new EOFException(s"bad WARC-Date: $v") else null }
            case "content-type"   => ctype = v
            case "content-length" =>
              len = try java.lang.Long.parseLong(v) catch { case _: Exception => -1L }
            case _ => ()
          }
        }
        line = readLine(in)
      }
      if (line == null) return fail("EOF inside WARC header block")
      if (len < 0 || len > MaxRecordBytes)
        return fail(s"missing/invalid Content-Length ($len)")
      val block = new Array[Byte](len.toInt)
      if (!readFully(in, block)) return fail("EOF inside record block")
      val rec = Record(if (recType == null) "" else recType, uri, date, ctype, block, idx)
      idx += 1
      rec
    }

    override def hasNext: Boolean = {
      if (done) return false
      if (nextRec == null) nextRec = advance()
      nextRec != null
    }

    override def next(): Record = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRec; nextRec = null; r
    }

    /** Close the wrapped stream. For gzip inputs this is the only call
      * that releases the member chain's native zlib Inflater — a reader
      * that closes only the RAW file stream leaks one Inflater's off-heap
      * state per container until GC.
      */
    def close(): Unit = in.close()
  }

  /** Open a record iterator over a raw file stream, applying gzip if the
    * name says so. `GZIPInputStream` chains concatenated members, which is
    * exactly Common Crawl's record-per-member layout.
    */
  def records(raw: InputStream, fileName: String, strict: Boolean): RecordIterator = {
    // the GZIP header is read by the CONSTRUCTOR, so corruption at byte 0
    // (zero-byte file, chopped header) throws here, not inside the
    // iterator — same lenient/strict split as mid-stream corruption
    val in =
      if (fileName.endsWith(".gz"))
        try new GZIPInputStream(raw, 64 * 1024)
        catch {
          case e @ (_: java.util.zip.ZipException | _: EOFException) =>
            if (strict) throw e else null
        }
      else raw
    if (in == null) new RecordIterator(new java.io.ByteArrayInputStream(Array.emptyByteArray), strict)
    else new RecordIterator(in, strict)
  }

  /** Split a response record's block into (status, Content-Type, body).
    * A block that is not an HTTP message (resource records, exotic
    * crawlers) comes back whole as the body with null status/type —
    * never throws (S9 posture). `withBody = false` skips the body copy
    * entirely (body = null): a pruned read that kept only status /
    * content_type must not pay a full duplicate allocation of every page
    * body.
    */
  def parseHttp(block: Array[Byte]): HttpPayload = parseHttp(block, withBody = true)

  def parseHttp(block: Array[Byte], withBody: Boolean): HttpPayload = {
    if (block.length < 8 || !(block(0) == 'H' && block(1) == 'T' && block(2) == 'T' && block(3) == 'P'))
      return HttpPayload(null, null, if (withBody) block else null)
    // status line + headers are ASCII; find the header/body split
    var split = -1
    var i = 0
    val max = block.length - 3
    while (split < 0 && i < max) {
      if (block(i) == '\r' && block(i + 1) == '\n' && block(i + 2) == '\r' && block(i + 3) == '\n')
        split = i
      i += 1
    }
    if (split < 0) return HttpPayload(null, null, if (withBody) block else null)
    val head = new String(block, 0, split, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status: java.lang.Integer = {
      val parts = lines(0).split(" ")
      if (parts.length >= 2) try java.lang.Integer.valueOf(parts(1).toInt) catch { case _: Exception => null }
      else null
    }
    var ctype: String = null
    var j = 1
    while (j < lines.length) {
      val l = lines(j)
      val c = l.indexOf(':')
      if (c > 0 && l.substring(0, c).trim.equalsIgnoreCase("content-type"))
        ctype = l.substring(c + 1).trim
      j += 1
    }
    HttpPayload(status, ctype,
      if (withBody) java.util.Arrays.copyOfRange(block, split + 4, block.length)
      else null)
  }

  // ---- fixture writer ------------------------------------------------

  private def warcHeaders(recType: String, uri: String, date: Instant,
                          contentType: String, blockLen: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(recType).append("\r\n")
    if (uri != null) sb.append("WARC-Target-URI: ").append(uri).append("\r\n")
    sb.append("WARC-Date: ").append(date.toString).append("\r\n")
    sb.append("WARC-Record-ID: <urn:graft:").append(recType).append(':')
      .append(java.lang.Long.toHexString(date.toEpochMilli)).append(">\r\n")
    if (contentType != null) sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(blockLen).append("\r\n\r\n")
    // UTF-8, matching the reader (ISO 28500 §5.1): a Latin-1 writer would
    // round-trip only because the reader made the same mistake
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Serialize one record (headers + block + CRLFCRLF terminator). */
  def encodeRecord(recType: String, uri: String, date: Instant,
                   contentType: String, block: Array[Byte]): Array[Byte] = {
    val head = warcHeaders(recType, uri, date, contentType, block.length)
    val out = new Array[Byte](head.length + block.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(block, 0, out, head.length, block.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Wrap an HTTP 200 response message around a body (the block of a
    * `response` record).
    */
  def httpResponseBlock(body: Array[Byte], contentType: String = "text/html"): Array[Byte] = {
    val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + body.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out
  }

  /** `close()` on a GZIPOutputStream is the only call that releases its
    * native zlib Deflater (finish() does not), but it also closes the
    * underlying stream — a per-member writer over a shared file needs this
    * shield so every member can be properly closed.
    */
  private final class NoCloseStream(out: OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def close(): Unit = out.flush()
  }

  /** Append `bytes` to `out` as ONE complete gzip member, releasing the
    * member's native Deflater immediately (a writer that only finish()es
    * leaks ~256 KB of off-heap zlib state per member until finalization).
    */
  def writeGzipMember(out: OutputStream, bytes: Array[Byte]): Unit = {
    val gz = new GZIPOutputStream(new NoCloseStream(out), 64 * 1024)
    gz.write(bytes)
    gz.close()
  }

  /** Write records to `out`, Common-Crawl style when `gzipPerRecord`:
    * each record its own gzip member. A leading `warcinfo` record is
    * emitted (readers must skip non-kept types).
    */
  def write(out: OutputStream, records: Seq[(String, Instant, Array[Byte])],
            gzipPerRecord: Boolean): Unit = {
    def emit(bytes: Array[Byte]): Unit =
      if (gzipPerRecord) writeGzipMember(out, bytes)
      else out.write(bytes)
    val info = "software: graft-warc-fixture\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(StandardCharsets.ISO_8859_1)
    emit(encodeRecord("warcinfo", null, Instant.EPOCH, "application/warc-fields", info))
    records.foreach { case (uri, date, body) =>
      emit(encodeRecord("response", uri, date,
        "application/http; msgtype=response", httpResponseBlock(body)))
    }
    out.flush()
  }
}
