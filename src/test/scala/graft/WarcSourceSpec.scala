package graft

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.sources.warc.{Warc, WarcIO}

class WarcSourceSpec extends SparkTestBase {

  private def body(i: Int): Array[Byte] =
    s"<html><body>doc $i body ${"x" * (i % 7)}</body></html>".getBytes(UTF_8)

  private def recs(n: Int, off: Int = 0): Seq[(String, Instant, Array[Byte])] =
    (0 until n).map { i =>
      (s"https://example.test/p/${off + i}", Instant.ofEpochSecond(1700000000L + off + i),
        body(off + i))
    }

  private def writeDir(name: String, gz: Boolean): String = {
    val dir = Files.createDirectories(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-warc-spec", name))
    dir.toFile.listFiles().foreach(_.delete())
    val ext = if (gz) ".warc.gz" else ".warc"
    Seq(0, 3).foreach { off =>
      val f = dir.resolve(s"part-$off$ext")
      val out = new FileOutputStream(f.toFile)
      try Warc.write(out, recs(3, off), gzipPerRecord = gz) finally out.close()
    }
    dir.toString
  }

  test("gz roundtrip: urls, timestamps, payload bytes, status, file lineage") {
    val dir = writeDir("gz", gz = true)
    val df = spark.read.format("warc").load(dir)
    val rows = df.orderBy("url").collect()
    assert(rows.length === 6)
    assert(rows.map(_.getAs[String]("url")).toSeq ===
      (0 until 6).map(i => s"https://example.test/p/$i"))
    val r0 = rows(0)
    assert(r0.getAs[java.sql.Timestamp]("warc_ts").toInstant ===
      Instant.ofEpochSecond(1700000000L))
    assert(r0.getAs[Array[Byte]]("html").toSeq === body(0).toSeq)
    assert(r0.getAs[Int]("http_status") === 200)
    assert(r0.getAs[String]("content_type") === "text/html")
    assert(r0.getAs[String]("rec_type") === "response")
    assert(r0.getAs[String]("warc_file").endsWith("part-0.warc.gz"))
    // warcinfo records were type-filtered, so rec_index of kept rows starts at 1
    assert(rows.map(_.getAs[Long]("rec_index")).min === 1L)
  }

  test("plain (uncompressed) container reads identically") {
    val dir = writeDir("plain", gz = false)
    val a = spark.read.format("warc").load(dir)
      .selectExpr("url", "sha2(html, 256) AS h").orderBy("url").collect()
    val gzDir = writeDir("gz2", gz = true)
    val b = spark.read.format("warc").load(gzDir)
      .selectExpr("url", "sha2(html, 256) AS h").orderBy("url").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("column pruning reaches the scan and payload-free projection works") {
    val dir = writeDir("prune", gz = true)
    val df = spark.read.format("warc").load(dir).select("url")
    val scan = df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("url"))
    assert(df.count() === 6)
  }

  test("keepTypes opens non-response records; warcinfo visible when asked") {
    val dir = writeDir("types", gz = true)
    val all = spark.read.format("warc").option("keepTypes", "response,warcinfo").load(dir)
    assert(all.where("rec_type = 'warcinfo'").count() === 2) // one per file
    // warcinfo block is not an HTTP message: body = raw block, no status
    val info = all.where("rec_type = 'warcinfo'").selectExpr("http_status", "html").head()
    assert(info.isNullAt(0))
    assert(new String(info.getAs[Array[Byte]](1), UTF_8).contains("graft-warc-fixture"))
  }

  test("lenient mode: truncated tail yields the intact prefix; strict throws") {
    val dir = Files.createDirectories(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-warc-spec", "trunc"))
    dir.toFile.listFiles().foreach(_.delete())
    // build an UNCOMPRESSED container and chop it mid-record-block
    val bos = new java.io.ByteArrayOutputStream()
    Warc.write(bos, recs(3), gzipPerRecord = false)
    val bytes = bos.toByteArray
    val cut = bytes.length - body(2).length / 2 - 4
    Files.write(dir.resolve("t.warc"), java.util.Arrays.copyOf(bytes, cut))
    val lenient = spark.read.format("warc").load(dir.toString)
    assert(lenient.count() === 2)
    val strict = spark.read.format("warc").option("strict", "true").load(dir.toString)
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(e.getMessage != null)
  }

  test("gzip-level corruption (half-written member) is a lenient corrupt tail") {
    val dir = Files.createDirectories(
      Paths.get(System.getProperty("java.io.tmpdir"), "graft-warc-spec", "gzcorrupt"))
    dir.toFile.listFiles().foreach(_.delete())
    val bos = new java.io.ByteArrayOutputStream()
    Warc.write(bos, recs(3), gzipPerRecord = true)
    val whole = bos.toByteArray
    // chop the LAST gzip member in half: members for warcinfo + 3 records
    val cut = whole.length - 40
    Files.write(dir.resolve("t.warc.gz"), java.util.Arrays.copyOf(whole, cut))
    val lenient = spark.read.format("warc").load(dir.toString)
    assert(lenient.count() === 2) // intact prefix survives
    val strict = spark.read.format("warc").option("strict", "true").load(dir.toString)
    intercept[org.apache.spark.SparkException] { strict.count() }
  }

  test("parser: angle-bracketed URIs and non-HTTP resource blocks") {
    val block = "raw resource bytes".getBytes(UTF_8)
    val rec = Warc.encodeRecord("resource", "<https://a.test/r>",
      Instant.ofEpochSecond(1700000001L), "text/plain", block)
    val it = Warc.records(new ByteArrayInputStream(rec), "x.warc", strict = true)
    val r = it.next()
    assert(r.targetUri === "https://a.test/r")
    assert(r.recType === "resource")
    val http = Warc.parseHttp(r.block)
    assert(http.status == null)
    assert(http.body.toSeq === block.toSeq)
    assert(!it.hasNext)
  }

  test("--pages-format warc parses and a warc-fed epoch clusters end-to-end") {
    assert(Main.parse(Seq("--pages", "/p", "--state", "/s",
      "--pages-format", "warc")).isRight)
    assert(Main.parse(Seq("--pages", "/p", "--state", "/s",
      "--pages-format", "nope")).isLeft)
    val dir = writeDir("epoch", gz = true)
    val state = Files.createTempDirectory("graft-warc-state").toString
    val pages = graft.pages.PagesIO.read(spark, dir, "warc")
      .withColumn("text", graft.fingerprint.Fingerprints.extractText(
        org.apache.spark.sql.functions.col("html")))
    val (nNew, nClusters) = graft.state.Checkpoints.clusterEpoch(
      spark, pages, "url", "text", state, graft.pipeline.DedupConfig())
    assert(nNew === 6)
    assert(nClusters === 6) // fixture docs are all distinct
  }

  test("streaming: new containers become new micro-batches") {
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-warc-spec", "stream")).toString
    Paths.get(dir).toFile.listFiles().foreach(_.delete())
    val cp = Files.createTempDirectory("graft-warc-cp").toString
    def writeFile(name: String, off: Int): Unit = {
      val out = new FileOutputStream(Paths.get(dir, name).toFile)
      try Warc.write(out, recs(3, off), gzipPerRecord = true) finally out.close()
    }
    writeFile("a.warc.gz", 0)
    val q = spark.readStream.format("warc").load(dir)
      .selectExpr("url").writeStream.format("memory")
      .queryName("warc_stream").option("checkpointLocation", cp).start()
    try {
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() === 3)
      writeFile("b.warc.gz", 3)
      q.processAllAvailable()
      assert(spark.table("warc_stream").count() === 6)
      assert(spark.table("warc_stream").select("url").distinct().count() === 6)
    } finally q.stop()
  }

  test("streaming restart: seen-set rebuilt from batch logs, ranges replay exactly") {
    import graft.sources.warc.{WarcMicroBatchStream, WarcOffset}
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-warc-spec", "restart")).toString
    Paths.get(dir).toFile.listFiles().foreach(_.delete())
    val cp = Files.createTempDirectory("graft-warc-cp2").toString
    def writeFile(name: String, off: Int): Unit = {
      val out = new FileOutputStream(Paths.get(dir, name).toFile)
      try Warc.write(out, recs(2, off), gzipPerRecord = true) finally out.close()
    }
    val conf = spark.sparkContext.broadcast(
      new graft.sources.warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    def mkStream() = new WarcMicroBatchStream(cp, Seq(dir),
      Array("url"), Set("response"), strict = false,
      maxPartitionBytes = 64L * 1024 * 1024, defaultParallelism = 4, conf)

    val s1 = mkStream()
    writeFile("a.warc.gz", 0)
    assert(s1.latestOffset() === WarcOffset(0))
    writeFile("b.warc.gz", 2)
    assert(s1.latestOffset() === WarcOffset(1))
    assert(s1.latestOffset() === WarcOffset(1)) // no new files → same offset

    // "crash": a fresh instance over the same checkpoint must not re-mint
    // batches for files already logged, and must replay ranges exactly
    val s2 = mkStream()
    assert(s2.latestOffset() === WarcOffset(1))
    def filesOf(parts: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      parts.flatMap(_.asInstanceOf[graft.sources.warc.WarcInputPartition].files)
        .map(_._1).sorted.toSeq
    val replay = filesOf(s2.planInputPartitions(WarcOffset(-1), WarcOffset(1)))
    assert(replay.length === 2)
    assert(replay.head.endsWith("a.warc.gz") && replay.last.endsWith("b.warc.gz"))
    val only1 = filesOf(s2.planInputPartitions(WarcOffset(0), WarcOffset(1)))
    assert(only1 === Seq(only1.head))
    assert(only1.head.endsWith("b.warc.gz"))
    writeFile("c.warc.gz", 4)
    assert(s2.latestOffset() === WarcOffset(2))
    // offsets roundtrip through json (the engine's restart path)
    assert(s2.deserializeOffset(WarcOffset(2).json()) === WarcOffset(2))

    // crawl-watch posture: a drop dir that does not exist YET is an empty
    // poll, not a crash (batch reads of a bad path stay loud errors)
    val ghost = new WarcMicroBatchStream(
      Files.createTempDirectory("graft-warc-cp3").toString,
      Seq(Paths.get(dir, "not-created-yet").toString),
      Array("url"), Set("response"), strict = false,
      maxPartitionBytes = 64L * 1024 * 1024, defaultParallelism = 4, conf)
    assert(ghost.latestOffset() === WarcOffset(-1))
    // the full readStream path must also start cleanly on a missing dir
    // (build() used to list eagerly and crash before toMicroBatchStream)
    val ghostQ = spark.readStream.format("warc")
      .load(Paths.get(dir, "also-not-created").toString)
      .selectExpr("url").writeStream.format("memory")
      .queryName("warc_ghost").start()
    try { ghostQ.processAllAvailable(); assert(spark.table("warc_ghost").count() === 0) }
    finally ghostQ.stop()
    intercept[IllegalArgumentException] {
      spark.read.format("warc").load(Paths.get(dir, "not-created-yet").toString).count()
    }
  }

  test("non-ASCII target URIs round-trip as UTF-8 (ISO 28500 headers)") {
    val uri = "https://example.test/café/über?q=索"
    val rec = Warc.encodeRecord("response", uri, Instant.EPOCH,
      "application/http; msgtype=response", Warc.httpResponseBlock(body(1)))
    val it = Warc.records(new ByteArrayInputStream(rec), "u.warc", strict = false)
    assert(it.next().targetUri === uri)
  }

  test("corrupt Content-Length / runaway header line: lenient prefix, no bomb") {
    val good = Warc.encodeRecord("response", "https://a.test/ok", Instant.EPOCH,
      "application/http; msgtype=response", Warc.httpResponseBlock(body(2)))
    // a bit-flipped Content-Length within Int range must not drive a 2 GB
    // allocation (OutOfMemoryError would escape the lenient catch)
    val evil = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a.test/evil\r\n" +
      "WARC-Date: 1970-01-01T00:00:00Z\r\nContent-Length: 2000000000\r\n\r\n")
      .getBytes(UTF_8)
    val it = Warc.records(new ByteArrayInputStream(good ++ evil), "c.warc",
      strict = false)
    assert(it.toSeq.map(_.targetUri) === Seq("https://a.test/ok"))
    intercept[java.io.EOFException] {
      Warc.records(new ByteArrayInputStream(good ++ evil), "c.warc",
        strict = true).toList
    }
    // binary garbage with no newline must not buffer the stream into one
    // ever-growing header "line"
    val noNewline = Array.fill[Byte](Warc.MaxHeaderLineBytes + 64)('A')
    val it2 = Warc.records(new ByteArrayInputStream(good ++ noNewline),
      "n.warc", strict = false)
    assert(it2.toSeq.map(_.targetUri) === Seq("https://a.test/ok"))
  }

  test("metadata-only parse skips the body copy; full parse keeps it") {
    val block = Warc.httpResponseBlock(body(3))
    val full = Warc.parseHttp(block)
    val meta = Warc.parseHttp(block, withBody = false)
    assert(full.body != null && full.body.sameElements(body(3)))
    assert(meta.body == null)
    assert(meta.status === full.status && meta.contentType === full.contentType)
    // non-HTTP blocks: body only when asked
    val raw = "not http".getBytes(UTF_8)
    assert(Warc.parseHttp(raw).body.sameElements(raw))
    assert(Warc.parseHttp(raw, withBody = false).body == null)
  }

  test("streaming log compaction: committed batches collapse, tail survives") {
    import graft.sources.warc.{WarcMicroBatchStream, WarcOffset}
    val dir = Files.createDirectories(Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-warc-spec", "compact")).toString
    Paths.get(dir).toFile.listFiles().foreach(_.delete())
    val cp = Files.createTempDirectory("graft-warc-cp4").toString
    def writeFile(name: String, off: Int): Unit = {
      val out = new FileOutputStream(Paths.get(dir, name).toFile)
      try Warc.write(out, recs(2, off), gzipPerRecord = true) finally out.close()
    }
    val conf = spark.sparkContext.broadcast(
      new graft.sources.warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    System.setProperty("graft.warc.compactEvery", "2")
    try {
      def mkStream() = new WarcMicroBatchStream(cp, Seq(dir),
        Array("url"), Set("response"), strict = false,
        maxPartitionBytes = 64L * 1024 * 1024, defaultParallelism = 4, conf)
      val s1 = mkStream()
      (0 to 2).foreach { b =>
        writeFile(s"f$b.warc.gz", b * 2)
        assert(s1.latestOffset() === WarcOffset(b))
      }
      s1.commit(WarcOffset(1)) // 1 - (-1) >= 2 → compacts batches 0..1
      val logDir = Paths.get(cp, "graft-warc-batches").toFile
      def names = logDir.listFiles().map(_.getName).sorted.toSeq
      assert(names.contains("compact-1") && !names.contains("0") &&
        !names.contains("1") && names.contains("2"), names)
      // restart: seen set must cover compacted batches (no re-minting) and
      // the uncommitted tail must still replay from its surviving log
      val s2 = mkStream()
      assert(s2.latestOffset() === WarcOffset(2)) // nothing new → no batch 3
      val replay = s2.planInputPartitions(WarcOffset(1), WarcOffset(2))
        .flatMap(_.asInstanceOf[graft.sources.warc.WarcInputPartition].files)
      assert(replay.length === 1 && replay.head._1.endsWith("f2.warc.gz"))
      writeFile("f3.warc.gz", 6)
      assert(s2.latestOffset() === WarcOffset(3))
    } finally System.clearProperty("graft.warc.compactEvery")
  }

  test("bin-packing: tiny files coalesce, big files get their own bin") {
    import graft.sources.warc.WarcScan
    val tiny = (1 to 100).map(i => (f"f$i%03d", 1000L))
    val target = WarcScan.targetBytesFor(tiny, 128L * 1024 * 1024, 8)
    val bins = WarcScan.pack(tiny, target)
    assert(bins.length <= 13 && bins.length >= 7) // ~100/8 with open-cost padding
    assert(bins.flatten.sortBy(_._1) === tiny.sortBy(_._1)) // nothing lost
    val mixed = Seq(("big1", 2L << 30), ("big2", 2L << 30)) ++ tiny
    val bins2 = WarcScan.pack(mixed, 128L * 1024 * 1024)
    assert(bins2.count(_.exists(_._1.startsWith("big"))) === 2)
    assert(bins2.filter(_.exists(_._1.startsWith("big"))).forall(_.length === 1))
  }

  test("WarcIO.pages projects the engine input shape") {
    val dir = writeDir("pages", gz = true)
    val pages = WarcIO.pages(spark, dir)
    assert(pages.columns.toSeq === Seq("url", "warc_ts", "html"))
    assert(pages.count() === 6)
    // the extraction path downstream of the seam runs unchanged
    val txt = pages.select(
      graft.fingerprint.Fingerprints.extractText(org.apache.spark.sql.functions.col("html"))
        .as("text"))
    assert(txt.where("text LIKE '%doc 0 body%'").count() === 1)
  }
}
