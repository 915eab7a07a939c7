package graft

import org.apache.spark.sql.functions._

import graft.discovery.Discovery
import graft.fingerprint.{Fingerprints => FP}

/** Discovery-layer filter battery (reference `src/discovery/tests/`) and the
  * length-tiered shingle cap.
  */
class DiscoverySpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    ("site/a/page1", "hello world text", "en"),
    ("site/a/.hidden", "secret", "en"),          // F1: hidden
    ("tmp/cache/page2", "cached junk", "en"),    // F2: excluded prefix
    ("site/b/page3", "", "en"),                  // F3/F7: empty text
    ("site/b/page4", "unsupported language", "zz"), // F4: lang
    ("site/a/b/c/d/deep", "too deep", "en"),     // F5: depth
    ("site/c/page5", "guten tag welt", "de")
  ).toDF("url", "text", "lang")

  test("discover applies the full filter battery per root and unions roots") {
    val out = Discovery.discover(
      Seq(rows.filter($"lang" === "en"), rows.filter($"lang" =!= "en")),
      "url", "text", "lang",
      excludedPrefixes = Seq("tmp/"),
      supportedLangs = Seq("en", "de"),
      maxDepthSegments = 3)
      .select("url").as[String].collect().toSet
    assert(out == Set("site/a/page1", "site/c/page5"))
  }

  test("process_unsupported_formats bypasses the lang filter (config.rs:63)") {
    val out = Discovery.discover(Seq(rows), "url", "text", "lang",
      supportedLangs = Seq("en"), processUnsupported = true)
      .select("url").as[String].collect().toSet
    assert(out.contains("site/b/page4"))
  }

  test("maxShingles caps the signature cost on huge docs (tiered-cost analog)") {
    val big = Seq(Seq.tabulate(600)(i => s"w$i").mkString(" ")).toDF("t")
    val n = big.select(size(FP.shingleHashes($"t", 3, maxShingles = 100))).first().getInt(0)
    assert(n == 100)
    // fused kernel honors the same cap, byte-identically
    val fused = big.select(
      FP.shingleHashes($"t", 3, maxShingles = 100).as("g"),
      FP.docSignature($"t", 3, maxShingles = 100).getField("shingles").as("f"))
      .first()
    assert(fused.getSeq[Long](0) == fused.getSeq[Long](1))
    // uncapped: full shingle count
    val full = big.select(size(FP.shingleHashes($"t", 3))).first().getInt(0)
    assert(full == 598)
  }
}
