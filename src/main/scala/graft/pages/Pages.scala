package graft.pages

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The input row shape (BASELINE.json `input_hint`): one Common-Crawl-style
  * web page. Analog of the reference's `ImageFile`
  * (image-deduper `src/types.rs:49-64`): url≙path, warc_ts≙mtime,
  * lang≙format, length(text)≙size.
  */
case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Ground-truth duplicate pair emitted by the generator — the recall
  * fixture (reference analog: the named-transformation corpus
  * `tests/data/jpeg/valid/IMG-*_{original,compress_10,...}.jpeg`,
  * registry `src/test_utils/test_support.rs:87-139`).
  */
case class TruthPair(urlA: String, urlB: String, kind: String, expect_dup: Boolean)

/** Thin IO seam (SURVEY.md §7): production binds to an Iceberg table via
  * `spark.read.table("pages")`; the sandbox (no Iceberg runtime jar in
  * /opt/spark/jars) binds the same reader to Parquet paths. Everything
  * above this seam is identical in both deployments.
  */
object PagesIO {

  /** Path-vs-table routing for the `auto` format: a filesystem location has
    * a URI scheme, a path separator, or a parquet suffix; anything else —
    * including namespaced catalog identifiers like `catalog.db.pages` — is
    * a table name. `format` overrides the heuristic outright (the CLI's
    * `--pages-format`) for the cases no heuristic can win: a bare relative
    * dir name, a table whose name looks like a file.
    */
  private[pages] def isPathLike(s: String): Boolean =
    s.contains("/") || s.endsWith(".parquet") ||
      s.matches("(?i)^[a-z][a-z0-9+.-]*://.*")

  // the WRITE-side resolver: warc/jsonl are read-only ingestion formats
  // (writes go through ShardedExport for jsonl), so the error must say so
  // instead of listing them as if they were accepted here
  private def asPath(s: String, format: String): Boolean = format match {
    case "parquet" => true
    case "table"   => false
    case "auto"    => isPathLike(s)
    case "warc" | "jsonl" => throw new IllegalArgumentException(
      s"pages writes support auto/parquet/table only — '$format' is a " +
        "read-side ingestion format (for jsonl output use --export-format " +
        "jsonl / ShardedExport.exportShardsJsonl)")
    case other => throw new IllegalArgumentException(
      s"pages write format must be auto/parquet/table, got $other")
  }

  /** Explicit read schema for jsonl corpora — the other loader lingua
    * franca (and our own `--export-format jsonl` output). The schema is
    * DECLARED, never inferred: inference is a full decompress-and-parse
    * pass over the corpus before the real one — at 100 TB that doubles
    * ingest cost for information the operator already has. A superset of
    * the page shape plus the export surface's columns; fields absent from
    * a file read as null, extra fields in the file are ignored, and a
    * malformed line degrades to a null row (PERMISSIVE) — same
    * never-throw posture as the html extractors.
    */
  val JsonlSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "url STRING, id STRING, text STRING, lang STRING, source STRING, " +
        "n_tokens BIGINT, epoch BIGINT, warc_ts TIMESTAMP")

  def read(spark: SparkSession, pathOrTable: String, format: String = "auto"): DataFrame =
    if (format == "warc") graft.sources.warc.WarcIO.pages(spark, pathOrTable)
    else if (format == "jsonl") spark.read.schema(JsonlSchema).json(pathOrTable)
    else if (asPath(pathOrTable, format)) spark.read.parquet(pathOrTable)
    else spark.read.table(pathOrTable)

  def append(df: DataFrame, pathOrTable: String, format: String = "auto"): Unit =
    if (asPath(pathOrTable, format)) df.write.mode("append").parquet(pathOrTable)
    else df.write.mode("append").saveAsTable(pathOrTable)

  def overwrite(df: DataFrame, pathOrTable: String, format: String = "auto"): Unit =
    if (asPath(pathOrTable, format)) df.write.mode("overwrite").parquet(pathOrTable)
    else df.write.mode("overwrite").saveAsTable(pathOrTable)
}

/** Deterministic synthetic corpus generator (seeded; pure function of
  * (seed, index) so scale tiers are prefix-consistent — FIXTURES.md §5).
  *
  * Each base doc spawns named variants mirroring the reference's fixture
  * transformations; `kind` encodes expected pipeline behavior:
  *
  *  - exact_copy        → identical text, new url/ts (≙ compress_*: distance 0)
  *  - ws_noise          → whitespace/case jitter       (≙ small resize)
  *  - edit_5pct/10pct   → token replacement            (≙ rotate monotonicity)
  *  - shuffle_paras     → sentence-block permutation
  *  - truncate_60/30    → prefix containment cases (30 is sub-Jaccard:
  *                        only the suffix-array substring pass links it)
  *  - mid_quote         → a 25% contiguous slice from the MIDDLE (offset
  *                        37%): sub-Jaccard AND not a prefix — only the
  *                        offset-invariant anchor bands discover it
  *                        reliably (minhash tier P ≈ 0.74 at s ≈ 0.25)
  *  - boilerplate_wrap  → same text, different html chrome
  *  - unrelated         → fresh doc (precision guard, expect_dup = false)
  *
  * Generation is distributed: the driver only plans (spark.range), rows are
  * synthesized executor-side — the generator itself scales like the engine.
  */
object PagesGen {

  private val vocab: Array[String] = {
    // deterministic 512-word vocabulary from a seeded mixer — no external data
    val words = new Array[String](512)
    var i = 0
    while (i < 512) {
      var h = graft.fingerprint.HashKernels.avalanche(0xBEEF + i)
      val len = 3 + (java.lang.Long.remainderUnsigned(h, 6)).toInt
      val sb = new StringBuilder
      var j = 0
      while (j < len) {
        h = graft.fingerprint.HashKernels.avalanche(h)
        sb.append(('a' + java.lang.Long.remainderUnsigned(h, 26)).toChar)
        j += 1
      }
      words(i) = sb.toString
      i += 1
    }
    words
  }

  private def rng(seed: Long): () => Long = {
    var s = graft.fingerprint.HashKernels.avalanche(seed)
    () => { s = graft.fingerprint.HashKernels.avalanche(s + 0x9E3779B97F4A7C15L); s }
  }

  private def baseTokens(seed: Long, docIdx: Long, nTokens: Int): Array[String] = {
    val r = rng(seed * 1000003L + docIdx)
    Array.fill(nTokens)(vocab(java.lang.Long.remainderUnsigned(r(), vocab.length).toInt))
  }

  /** Variant kinds in deterministic order; index 0 is the original. */
  val variantKinds: Seq[String] = Seq(
    "original", "exact_copy", "ws_noise", "edit_5pct", "edit_10pct",
    "shuffle_paras", "truncate_60", "truncate_30", "mid_quote",
    "boilerplate_wrap", "unrelated")

  def expectDup(kind: String): Boolean = kind match {
    case "original" | "unrelated" => false // not pairs themselves
    case _                        => true
  }

  private def applyVariant(kind: String, base: Array[String], seed: Long, docIdx: Long): Array[String] = {
    val r = rng(seed * 7777777L + docIdx * 131L + kind.hashCode)
    kind match {
      case "original" | "exact_copy" | "boilerplate_wrap" => base
      case "ws_noise" =>
        // surface noise only: capitalize ~10% of words. Raw text differs
        // (content_hash changes) but normalized tokens are identical →
        // Jaccard 1.0: the canonical "near-dup that is trivially caught".
        base.map(w => if (java.lang.Long.remainderUnsigned(r(), 100) < 10) w.toUpperCase else w)
      case "edit_5pct" =>
        base.map(w => if (java.lang.Long.remainderUnsigned(r(), 100) < 5)
          vocab(java.lang.Long.remainderUnsigned(r(), vocab.length).toInt) else w)
      case "edit_10pct" =>
        base.map(w => if (java.lang.Long.remainderUnsigned(r(), 100) < 10)
          vocab(java.lang.Long.remainderUnsigned(r(), vocab.length).toInt) else w)
      case "shuffle_paras" =>
        val block = 20
        val blocks = base.grouped(block).toArray
        // deterministic Fisher-Yates over blocks
        var i = blocks.length - 1
        while (i > 0) {
          val j = java.lang.Long.remainderUnsigned(r(), i + 1).toInt
          val t = blocks(i); blocks(i) = blocks(j); blocks(j) = t
          i -= 1
        }
        blocks.flatten
      case "truncate_60" => base.take(math.max(1, (base.length * 60) / 100))
      // 30% prefix: Jaccard ≈ 0.3 sits BELOW the verify threshold — only the
      // suffix-array substring pass can link it (the fixture that makes the
      // north_rule's substring pass load-bearing, not decorative)
      case "truncate_30" => base.take(math.max(1, (base.length * 30) / 100))
      // verbatim middle slice: normalized(text) of the variant is a
      // substring of the original's — the suffix-array pass verifies it;
      // DISCOVERY must come from the offset-invariant anchor bands
      case "mid_quote" =>
        val start = (base.length * 37) / 100
        val len = math.max(1, (base.length * 25) / 100)
        base.slice(start, start + len)
      case "unrelated"   => baseTokens(seed + 555555L, docIdx * 31 + 17, base.length)
      case other => throw new IllegalArgumentException(s"unknown variant $other")
    }
  }

  /** Render tokens into deterministic html; extraction invariant
    * extract(html) == text holds by construction (text is built first,
    * then wrapped — FIXTURES.md §1).
    */
  private def render(tokens: Array[String], kind: String, url: String): (String, Array[Byte]) = {
    val sentences = tokens.grouped(10).map(_.mkString(" ")).toArray
    val text = sentences.mkString(" ")
    val chrome =
      if (kind == "boilerplate_wrap")
        ("<nav><a href=\"/a\">alpha</a><a href=\"/b\">beta</a></nav>",
         "<footer>generated corpus · variant chrome</footer>")
      else ("<nav><a href=\"/home\">home</a></nav>", "<footer>corpus</footer>")
    val ws = if (kind == "ws_noise") "\n\t  " else "\n"
    val bodyClean = sentences.map(s => s"<p>$s</p>").mkString(ws)
    val html =
      s"""<html><head><title>$url</title><style>p{margin:0}</style></head>
         |<body>${chrome._1}
         |$bodyClean
         |${chrome._2}</body></html>""".stripMargin
    (text, html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Generate `numBase` base docs × 10 variants as a Dataset[Page], plus the
    * ground-truth pair table. Fully distributed: rows are produced
    * executor-side from (seed, index).
    */
  def pages(spark: SparkSession, numBase: Long, seed: Long = 42L,
            tokensPerDoc: Int = 300): Dataset[Page] = {
    import spark.implicits._
    val kinds = variantKinds
    spark.range(numBase * kinds.length).mapPartitions { it =>
      it.map { idx =>
        val docIdx = idx / kinds.length
        val kind = kinds((idx % kinds.length).toInt)
        makePage(seed, docIdx, kind, tokensPerDoc)
      }
    }
  }

  def makePage(seed: Long, docIdx: Long, kind: String, tokensPerDoc: Int): Page = {
    val r = rng(seed * 424242L + docIdx)
    val n = tokensPerDoc / 2 + java.lang.Long.remainderUnsigned(r(), tokensPerDoc).toInt
    val base = baseTokens(seed, docIdx, n)
    val toks = applyVariant(kind, base, seed, docIdx)
    val url = s"https://site${docIdx % 97}.example/p/$docIdx/$kind"
    val (text, html) = render(toks, kind, url)
    val ts = new Timestamp(1700000000000L + docIdx * 60000L + variantKinds.indexOf(kind) * 1000L)
    val lang = Seq("en", "en", "en", "de", "fr", "es")(
      java.lang.Long.remainderUnsigned(graft.fingerprint.HashKernels.avalanche(docIdx), 6).toInt)
    Page(url, ts, html, text, lang)
  }

  /** Ground-truth dup pairs: every non-unrelated variant pairs with its
    * original. `truncate_60` is flagged `containment` (caught by the
    * containment pass, not symmetric Jaccard).
    */
  def truthPairs(spark: SparkSession, numBase: Long, seed: Long = 42L): Dataset[TruthPair] = {
    import spark.implicits._
    spark.range(numBase).flatMap { docIdx =>
      val orig = s"https://site${docIdx % 97}.example/p/$docIdx/original"
      variantKinds.filter(k => k != "original").map { k =>
        TruthPair(orig, s"https://site${docIdx % 97}.example/p/$docIdx/$k", k, expectDup(k))
      }
    }
  }

  // ── skew-stress corpus ──────────────────────────────────────────────

  /** Base docs with docIdx % 10 == 0 become the MEGA EXACT-GROUP: all their
    * variants carry this one parked-domain text (10% of all rows
    * byte-identical — the empty-page/parked-domain black hole of real web
    * crawls, stressing the exact-first rep design).
    */
  private def parkedTokens(tokensPerDoc: Int): Array[String] =
    baseTokens(0xBADC0DEL, 0L, tokensPerDoc)

  /** Base docs with docIdx % 10 == 1 get the HOT BOILERPLATE PREFIX: one
    * identical 60-token prefix prepended to every variant — a prefix-band
    * (and anchor-band) mega bucket covering ~10% of the corpus, the
    * quadratic boilerplate channel `containmentMaxBucket` exists to defuse.
    */
  private def hotPrefixTokens: Array[String] =
    baseTokens(0x5EEDFACEL, 1L, 60)

  def skewMega(docIdx: Long): Boolean = docIdx % 10 == 0
  def skewHotPrefix(docIdx: Long): Boolean = docIdx % 10 == 1

  /** The skew-stress corpus: the standard deterministic corpus with the two
    * planted pathologies above. Same schema, urls and row count as
    * [[pages]]; the mega-group and hot-prefix assignments are deterministic
    * functions of docIdx, so ground truth stays closed-form.
    */
  def skewPages(spark: SparkSession, numBase: Long, seed: Long = 42L,
                tokensPerDoc: Int = 300): Dataset[Page] = {
    import spark.implicits._
    val kinds = variantKinds
    spark.range(numBase * kinds.length).mapPartitions { it =>
      it.map { idx =>
        val docIdx = idx / kinds.length
        val kind = kinds((idx % kinds.length).toInt)
        makeSkewPage(seed, docIdx, kind, tokensPerDoc)
      }
    }
  }

  def makeSkewPage(seed: Long, docIdx: Long, kind: String, tokensPerDoc: Int): Page = {
    if (skewMega(docIdx)) {
      val url = s"https://site${docIdx % 97}.example/p/$docIdx/$kind"
      val (text, html) = render(parkedTokens(tokensPerDoc), kind, url)
      val ts = new Timestamp(1700000000000L + docIdx * 60000L + variantKinds.indexOf(kind) * 1000L)
      Page(url, ts, html, text, "en")
    } else if (skewHotPrefix(docIdx)) {
      val r = rng(seed * 424242L + docIdx)
      val n = tokensPerDoc / 2 + java.lang.Long.remainderUnsigned(r(), tokensPerDoc).toInt
      val base = baseTokens(seed, docIdx, n)
      val toks = hotPrefixTokens ++ applyVariant(kind, base, seed, docIdx)
      val url = s"https://site${docIdx % 97}.example/p/$docIdx/$kind"
      val (text, html) = render(toks, kind, url)
      val ts = new Timestamp(1700000000000L + docIdx * 60000L + variantKinds.indexOf(kind) * 1000L)
      Page(url, ts, html, text, "en")
    } else makePage(seed, docIdx, kind, tokensPerDoc)
  }

  /** Ground truth for the skew corpus. Mega-group docs pair only within the
    * mega cluster (asserted separately as one exact cluster). Hot-prefix
    * docs keep their variant pairs EXCEPT mid_quote: boilerplate + a
    * mid-document quote is no longer a contiguous substring of boilerplate
    * + original, so it is not a containment dup under the engine's (or any
    * substring-based) semantics.
    */
  def skewTruthPairs(spark: SparkSession, numBase: Long, seed: Long = 42L): Dataset[TruthPair] = {
    import spark.implicits._
    spark.range(numBase).filter(d => !skewMega(d)).flatMap { docIdx =>
      val orig = s"https://site${docIdx % 97}.example/p/$docIdx/original"
      variantKinds
        .filter(k => k != "original")
        .filter(k => !(skewHotPrefix(docIdx) && k == "mid_quote"))
        .map { k =>
          TruthPair(orig, s"https://site${docIdx % 97}.example/p/$docIdx/$k", k, expectDup(k))
        }
    }
  }
}
