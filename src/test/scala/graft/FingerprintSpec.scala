package graft

import org.apache.spark.sql.functions._

import graft.fingerprint.{Fingerprints => FP, TextExtraction}
import graft.pages.PagesGen

/** Layer-1/2 tests (SURVEY.md §5): golden values per kernel + metamorphic
  * distance assertions — the analog of the reference's
  * `processing_tests.rs` golden blake3/pHash values and perturbation tests.
  */
class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def oneText(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row =
    df.first()

  test("normalization collapses whitespace and case") {
    val r = Seq("  Hello   WORLD\t\n foo ").toDF("t")
      .select(FP.normalized($"t")).first().getString(0)
    assert(r == "hello world foo")
  }

  test("tokens of empty text is empty array") {
    val n = Seq("", "   ").toDF("t").select(size(FP.tokens($"t"))).collect().map(_.getInt(0))
    assert(n.toSeq == Seq(0, 0))
  }

  test("shingle hashes: doc shorter than k yields one whole-doc shingle") {
    val n = Seq("one two").toDF("t").select(size(FP.shingleHashes($"t", 3))).first().getInt(0)
    assert(n == 1)
  }

  test("shingle count = tokens - k + 1 (distinct)") {
    val n = Seq("a b c d e f g").toDF("t")
      .select(size(FP.shingleHashes($"t", 3))).first().getInt(0)
    assert(n == 5)
  }

  test("minhash signature has 128 slots, deterministic across runs") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
      .select(FP.minhash($"t", 3).as("mh"))
    val a = df.first().getSeq[Long](0)
    val b = df.first().getSeq[Long](0)
    assert(a.length == 128 && a == b)
  }

  test("identical normalized text -> identical minhash + simhash") {
    val df = Seq(("Hello  World foo bar baz", "hello world FOO bar baz")).toDF("a", "b")
      .select(FP.minhash($"a", 2).as("ma"), FP.minhash($"b", 2).as("mb"),
        FP.simhash($"a").as("sa"), FP.simhash($"b").as("sb"))
    val r = df.first()
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    assert(r.getLong(2) == r.getLong(3))
  }

  test("metamorphic: minhash jaccard estimate tracks exact jaccard within 0.15") {
    // 200-token doc vs 10% token-edit variant: exact jaccard of 3-shingles
    // vs the 128-perm estimate
    val base = PagesGen.makePage(7L, 3L, "original", 200).text
    val edit = PagesGen.makePage(7L, 3L, "edit_10pct", 200).text
    val df = Seq((base, edit)).toDF("a", "b").select(
      FP.exactJaccard(FP.shingleHashes($"a", 3), FP.shingleHashes($"b", 3)).as("exact"),
      FP.minhashJaccardEst(FP.minhash($"a", 3), FP.minhash($"b", 3)).as("est"))
    val r = df.first()
    val (exact, est) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(exact - est) < 0.15, s"exact=$exact est=$est")
    assert(exact > 0.4 && exact < 1.0)
  }

  test("metamorphic: simhash hamming grows monotonically with edit rate") {
    val base = PagesGen.makePage(11L, 5L, "original", 300).text
    val e5 = PagesGen.makePage(11L, 5L, "edit_5pct", 300).text
    val e10 = PagesGen.makePage(11L, 5L, "edit_10pct", 300).text
    val unrel = PagesGen.makePage(11L, 5L, "unrelated", 300).text
    val df = Seq((base, e5, e10, unrel)).toDF("b", "e5", "e10", "u").select(
      FP.hamming(FP.simhash($"b"), FP.simhash($"e5")).as("d5"),
      FP.hamming(FP.simhash($"b"), FP.simhash($"e10")).as("d10"),
      FP.hamming(FP.simhash($"b"), FP.simhash($"u")).as("du"))
    val r = df.first()
    val (d5, d10, du) = (r.getInt(0), r.getInt(1), r.getInt(2))
    assert(d5 <= d10, s"d5=$d5 d10=$d10")
    assert(d10 < du, s"d10=$d10 du=$du")
    assert(du > 20, s"unrelated docs should be far: du=$du")
  }

  test("hamming distance is symmetric, zero on self") {
    val df = Seq((0x123456789abcdefL, 0x0fedcba987654321L)).toDF("x", "y").select(
      FP.hamming($"x", $"y").as("xy"), FP.hamming($"y", $"x").as("yx"),
      FP.hamming($"x", $"x").as("xx"))
    val r = df.first()
    assert(r.getInt(0) == r.getInt(1) && r.getInt(2) == 0)
  }

  test("extraction invariant: extract(html) == text byte-identically, all variant kinds") {
    for (kind <- PagesGen.variantKinds; docIdx <- 0L to 3L) {
      val p = PagesGen.makePage(42L, docIdx, kind, 120)
      val extracted = TextExtraction.extract(p.html)
      assert(extracted == p.text,
        s"kind=$kind doc=$docIdx\nextracted=${extracted.take(120)}\nexpected =${p.text.take(120)}")
    }
  }

  test("extraction: entities, boilerplate blocks, malformed input never throws") {
    assert(TextExtraction.extract("<p>a &amp; b &lt;c&gt; &#65;</p>".getBytes) == "a & b <c> A")
    assert(TextExtraction.extract(
      "<head><title>x</title></head><nav>menu</nav><p>keep</p><footer>f</footer>".getBytes) == "keep")
    assert(TextExtraction.extract("<p>unclosed <b>tag".getBytes) == "unclosed tag")
    assert(TextExtraction.extract(Array[Byte](-1, -2, 0x41)) == "A" ||
      TextExtraction.extract(Array[Byte](-1, -2, 0x41)).nonEmpty)
    assert(TextExtraction.extract(null) == "")
  }

  test("golden fingerprints: pinned values for fixed fixture urls") {
    // Any change to normalization/tokenization/extraction breaks these
    // loudly (reference analog: exact blake3/pHash goldens,
    // processing_tests.rs:29-62, 93-119).
    val p = PagesGen.makePage(42L, 0L, "original", 120)
    val df = Seq(p.text).toDF("t").select(
      FP.contentHash($"t").as("ch"), FP.simhash($"t").as("sh"),
      slice(FP.minhash($"t", 3), 1, 4).as("mh4"))
    val r = df.first()
    assert(r.getString(0) == "406dc046c0c538dbeb8f8ab4d260ef775433ceddd8f697093eb5ff57d13f8b43")
    assert(r.getLong(1) == -8670168198050635704L)
    assert(r.getSeq[Long](2).toList == List(
      37564775489406912L, 326144399867119643L, 34139793277256804L, 111480786120601227L))
  }

  test("fused DocSignature is byte-identical to the combinator path") {
    // every variant kind + edge cases (empty, blank, shorter-than-k, mixed ws)
    val texts = (for (kind <- PagesGen.variantKinds; d <- 0L to 2L)
      yield PagesGen.makePage(5L, d, kind, 150).text) ++
      Seq("", "   ", "one two", "  A\tB\nC  ", "x",
        // ASCII case-boundary bytes around A-Z ('@' 0x40, '[' 0x5B, '`', '{')
        // pin the fused fast path's inline lowercase range check
        "@AZ[ `az{ MiXeD",
        // non-ASCII exercises the fused expr's slow path (full Unicode
        // lowercase via UTF8String) against the combinator's `lower`
        "ÉPÉE Straße ЖУК 中文 текст",
        "Ascii THEN Üñïçödé tail")
    val df = texts.toDF("t").select(
      FP.simhash($"t").as("s1"),
      FP.shingleHashes($"t", 3).as("g1"),
      FP.minhash($"t", 3).as("m1"),
      FP.docSignature($"t", 3).as("ds"))
    df.collect().foreach { r =>
      val ds = r.getStruct(3)
      assert(r.getLong(0) == ds.getLong(0), "simhash differs")
      assert(r.getSeq[Long](1) == ds.getSeq[Long](1), "shingles differ")
      assert(r.getSeq[Long](2) == ds.getSeq[Long](2), "minhash differs")
    }
  }

  test("fallback hash is deterministic on metadata") {
    val df = Seq(("u1", 10L), ("u1", 10L), ("u2", 10L)).toDF("url", "len")
      .select(FP.fallbackHash($"url", $"len").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }
}
