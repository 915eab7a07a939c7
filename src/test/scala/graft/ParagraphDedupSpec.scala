package graft

import org.apache.spark.sql.functions.col

import graft.text.ParagraphDedup

class ParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("corpus-wide repeated paragraphs drop; first (doc, pos) occurrence survives") {
    val docs = Seq(
      (1L, "COOKIE BANNER\n\nunique alpha\n\nSHARED LEGAL"),
      (2L, "COOKIE BANNER\n\nunique beta"),
      (3L, "unique gamma\n\nSHARED LEGAL\n\nCOOKIE BANNER")).toDF("id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("text")).toSeq === Seq(
      "COOKIE BANNER\n\nunique alpha\n\nSHARED LEGAL", // doc 1 keeps everything (first)
      "unique beta",                                    // banner dropped (doc 1 pos 0 won)
      "unique gamma"))                                  // legal + banner both dropped
    assert(out.map(_.getAs[Long]("n_paras")).toSeq === Seq(3L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_dropped")).toSeq === Seq(0L, 1L, 2L))
  }

  test("within one doc the earlier position wins; order is preserved on rebuild") {
    val docs = Seq(
      (1L, "z last\n\nrepeat\n\na first\n\nrepeat")).toDF("id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text").head()
    assert(out.getAs[String]("text") === "z last\n\nrepeat\n\na first")
    assert(out.getAs[Long]("n_dropped") === 1L)
  }

  test("blank-ish paragraphs vanish; whitespace between blank lines still splits") {
    val docs = Seq((1L, "a\n \n\t\nb\n\n\n\nc"), (2L, "  \n\n  ")).toDF("id", "text")
    val paras = ParagraphDedup.explodeParagraphs(docs, "id", "text")
      .orderBy("id", "pos").select("para").as[String].collect()
    assert(paras.toSeq === Seq("a", "b", "c")) // doc 2 has no non-empty paragraph
    // paragraph-less docs still come out the other side, text untouched —
    // the pass removes paragraphs, never documents (Main's battery
    // join-back is an inner join on id)
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.length === 2)
    assert(out(1).getAs[String]("text") === "  \n\n  ")
    assert(out(1).getAs[Long]("n_paras") === 0L)
    assert(out(1).getAs[Long]("n_dropped") === 0L)
  }

  test("null-text docs survive the pass with text null") {
    val docs = Seq((1L, Some("a\n\nb")), (2L, None))
      .toDF("id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text")
      .orderBy("id").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(out(1).fieldIndex("text")))
    assert(out(1).getAs[Long]("n_paras") === 0L)
  }

  test("--para-dedup cleans text pre-pipeline; fully-duplicated docs stay visible") {
    assert(Main.parse(Seq("--pages", "/p", "--state", "/s", "--para-dedup"))
      .toOption.get.paraDedup)
    val dir = java.nio.file.Files.createTempDirectory("graft-para-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-para-state").toString
    Seq(
      ("http://a.test/1", "BOILER PLATE\n\nalpha body"),
      ("http://a.test/2", "BOILER PLATE\n\nbeta body"),
      ("http://a.test/3", "BOILER PLATE")) // every paragraph is a dup
      .toDF("url", "text").write.mode("overwrite").parquet(dir.toString)
    val out = Main.run(spark, Main.parse(Seq(
      "--pages", dir.toString, "--state", state, "--para-dedup")).toOption.get)
    // doc 3 keeps its text (wholly-duplicated content is DOCUMENT-level
    // dedup's case to record, not a quarantine row)
    assert(out.head.contains("\"new_signatures\":3"))
    val sigs = graft.state.Checkpoints.readSignatures(spark, state)
    val expected = Seq("BOILER PLATE\n\nalpha body", "beta body", "BOILER PLATE")
      .map { t =>
        Seq(t).toDF("t").select(
          graft.fingerprint.Fingerprints.contentHash(col("t"))).head().getString(0)
      }
    assert(sigs.select("content_hash").as[String].collect().sorted
      === expected.sorted.toArray)
  }

  test("fully-duplicated doc keeps its text; n_dropped marks it") {
    val docs = Seq(
      (1L, "same one\n\nsame two"),
      (2L, "same one\n\nsame two")).toDF("id", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text").orderBy("id").collect()
    assert(out(0).getAs[String]("text") === "same one\n\nsame two")
    assert(out(0).getAs[Long]("n_dropped") === 0L)
    assert(out(1).getAs[String]("text") === "same one\n\nsame two") // kept, not emptied
    assert(out(1).getAs[Long]("n_dropped") === 2L)                   // but fully marked
  }

  test("CRLF paragraph breaks split; the election window is a WindowGroupLimit") {
    val docs = Seq(
      (1L, "alpha\r\n\r\nshared"),
      (2L, "beta\r\n\r\nshared")).toDF("id", "text")
    val deduped = ParagraphDedup.dedupParagraphs(docs, "id", "text")
    val rows = deduped.orderBy("id").collect()
    assert(rows(0).getAs[String]("text") === "alpha\n\nshared")
    assert(rows(1).getAs[String]("text") === "beta") // CRLF corpus still dedups
    assert(deduped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("html-paras extractor: block boundaries become paragraph breaks") {
    import graft.fingerprint.TextExtraction
    val html = ("<html><head><title>t</title></head><body><nav>menu</nav>" +
      "<p>COOKIE NOTICE</p>\n<p>unique alpha</p><div>tail bit</div></body></html>")
      .getBytes("UTF-8")
    assert(TextExtraction.extractParas(html) ===
      "COOKIE NOTICE\n\nunique alpha\n\ntail bit")
    // the DEFAULT extractor is untouched (byte-identical corpus invariant)
    assert(TextExtraction.extract(html) === "COOKIE NOTICE unique alpha tail bit")
    // raw newlines in html are formatting, not breaks
    assert(TextExtraction.extractParas("<p>a\nb</p>".getBytes("UTF-8")) === "a b")
    // a hostile raw NUL cannot forge a paragraph break
    assert(TextExtraction.extractParas("a\u0000b".getBytes("UTF-8")) === "a b")
  }

  test("--extractor html-paras --para-dedup composes end-to-end on html pages") {
    assert(Main.parse(Seq("--pages", "/p", "--state", "/s",
      "--extractor", "nope")).isLeft)
    def page(u: String, paras: Seq[String]): (String, Array[Byte]) =
      (u, ("<html><body>" + paras.map(p => s"<p>$p</p>").mkString +
        "</body></html>").getBytes("UTF-8"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hp-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-hp-state").toString
    Seq(
      page("http://b.test/1", Seq("COOKIE NOTICE", "unique alpha")),
      page("http://b.test/2", Seq("COOKIE NOTICE", "unique beta")))
      .toDF("url", "html").write.mode("overwrite").parquet(dir.toString)
    Main.run(spark, Main.parse(Seq(
      "--pages", dir.toString, "--state", state,
      "--extract-from", "html", "--extractor", "html-paras",
      "--para-dedup")).toOption.get)
    val sigs = graft.state.Checkpoints.readSignatures(spark, state)
    val expected = Seq("COOKIE NOTICE\n\nunique alpha", "unique beta").map { t =>
      Seq(t).toDF("t").select(
        graft.fingerprint.Fingerprints.contentHash(col("t"))).head().getString(0)
    }
    assert(sigs.select("content_hash").as[String].collect().sorted
      === expected.sorted.toArray)
  }

  test("explicit order column overrides id order") {
    val docs = Seq(
      (10L, 2L, "dup\n\nten"),
      (20L, 1L, "dup\n\ntwenty")).toDF("id", "crawl_order", "text")
    val out = ParagraphDedup.dedupParagraphs(docs, "id", "text",
      orderCol = Some(col("crawl_order")))
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text") === "ten")     // doc 10 lost: order 2
    assert(out(1).getAs[String]("text") === "dup\n\ntwenty") // doc 20 won: order 1
  }
}
