package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.text.UrlCanon

class UrlCanonSpec extends SparkTestBase {
  private def c(s: String) = UrlCanon.canonicalize(s)

  test("scheme/host casing, default ports, fragments, userinfo, trailing dot") {
    assert(c("HTTPS://Example.COM:443/a#frag") === "https://example.com/a")
    assert(c("http://Example.com:80/") === "http://example.com/")
    assert(c("http://example.com:8080/a") === "http://example.com:8080/a")
    assert(c("https://example.com:80/a") === "https://example.com:80/a") // not https' default
    assert(c("http://user:pw@example.com/a") === "http://example.com/a")
    assert(c("http://example.com./a") === "http://example.com/a")
    assert(c("  http://example.com/a  ") === "http://example.com/a")
    // trailing dot HIDING behind a default port: port strips first, so the
    // dot still strips and canonicalize stays idempotent
    assert(c("http://example.com.:80/a") === "http://example.com/a")
    assert(c("HTTPS://Example.COM.:443/a") === "https://example.com/a")
    assert(c(c("http://example.com.:80/a")) === c("http://example.com.:80/a"))
  }

  test("path normalization: duplicate slashes collapse, empty path becomes /") {
    assert(c("http://example.com") === "http://example.com/")
    assert(c("http://example.com//a///b") === "http://example.com/a/b")
  }

  test("query: tracking params drop, rest sorted, emptied query drops its ?") {
    assert(c("http://e.com/p?b=2&a=1") === "http://e.com/p?a=1&b=2")
    assert(c("http://e.com/p?utm_source=x&a=1&UTM_Medium=y&gclid=z&fbclid=w") ===
      "http://e.com/p?a=1")
    assert(c("http://e.com/p?utm_source=x") === "http://e.com/p")
    assert(c("http://e.com/p?") === "http://e.com/p")
    assert(c("http://e.com/p?a=1&&a=1") === "http://e.com/p?a=1&a=1") // dedup is NOT claimed
    assert(c("http://e.com/p?ref_src=twsrc&yclid=1&_ga=2&mc_eid=3&igshid=4&msclkid=5") ===
      "http://e.com/p")
  }

  test("non-URL junk passes through unchanged; null stays null") {
    assert(c("not a url") === "not a url")
    assert(c("mailto:x@y.z") === "mailto:x@y.z") // no ://, untouched
    assert(c(null) === null)
  }

  test("surt: host labels reversed, non-default port kept, site pages sort contiguously") {
    assert(UrlCanon.surt("https://News.Example.COM/a/b?x=1#f") ===
      "com,example,news)/a/b?x=1")
    assert(UrlCanon.surt("http://example.com:8080/p") === "com,example:8080)/p")
    assert(UrlCanon.surt("plainstring") === "plainstring")
    // the property SURT exists for: one site's pages are one contiguous range
    val urls = Seq("http://a.org/z", "http://sub.example.com/1",
      "http://example.com/2", "http://b.net/x", "http://example.com/1")
    val sorted = urls.map(UrlCanon.surt).sorted
    val exampleIdx = sorted.zipWithIndex.filter(_._1.startsWith("com,example")).map(_._2)
    assert(exampleIdx === (exampleIdx.head to exampleIdx.last)) // contiguous
  }

  test("Column expressions match the pure function under codegen") {
    import spark.implicits._
    val urls = Seq(
      "HTTPS://Example.COM:443//a//b?b=2&utm_source=x&a=1#frag",
      "http://user@Sub.Example.org./p?",
      "junk^^string", null)
    val out = urls.toDF("u")
      .select(UrlCanon.urlCanon(col("u")).as("c"), UrlCanon.urlSurt(col("u")).as("s"))
      .collect()
    urls.zip(out).foreach { case (u, r) =>
      assert(Option(r.getAs[String]("c")) === Option(UrlCanon.canonicalize(u)))
      assert(Option(r.getAs[String]("s")) === Option(UrlCanon.surt(u)))
    }
  }

  test("canonicalizePages collapses within-batch respellings, newest crawl wins") {
    import spark.implicits._
    val rows = Seq(
      ("HTTP://E.com/p?b=2&a=1", new Timestamp(2000L), "new text"),
      ("http://e.com/p?a=1&b=2&utm_source=x", new Timestamp(1000L), "old text"),
      ("http://e.com/q", new Timestamp(1000L), "other page"))
      .toDF("url", "warc_ts", "text")
    val out = UrlCanon.canonicalizePages(rows, "url").orderBy("url").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("url") === "http://e.com/p?a=1&b=2")
    assert(out(0).getAs[String]("text") === "new text") // warc_ts 2000 beat 1000
    assert(out(1).getAs[String]("url") === "http://e.com/q")
    // CLI surface
    assert(Main.parse(Seq("--pages", "/p", "--state", "/s", "--canon-urls"))
      .toOption.get.canonUrls)
  }
}
