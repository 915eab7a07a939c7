package graft

import graft.text.HostBlocklist

/** A14 host blocklist: subdomain-covering SURT ancestor semantics, plan
  * literal InSet shape (no join, no exchange), and the CLI file wiring.
  */
class HostBlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private val pages = Seq(
    ("https://example.com/a", "a"),
    ("http://News.Example.com/b", "b"),
    ("http://deep.news.example.com/c", "c"),
    ("http://notexample.com/d", "d"),
    ("http://example.com.evil.org/e", "e"),
    ("http://host.org/f", "f")).toDF("url", "text")

  test("blocking a domain blocks its subdomains, not lookalikes") {
    val kept = HostBlocklist.dropBlockedHosts(pages, "url", Seq("Example.COM"))
      .select("url").as[String].collect().sorted
    // notexample.com is a different label; example.com.evil.org only
    // CONTAINS the name — its SURT ancestors are org / org,evil / ...
    assert(kept === Array(
      "http://notexample.com/d",
      "http://example.com.evil.org/e",
      "http://host.org/f").sorted)
  }

  test("empty blocklist is the identity; hostKey normalizes curation") {
    assert(HostBlocklist.dropBlockedHosts(pages, "url", Nil).count() === 6L)
    assert(HostBlocklist.hostKey("News.Example.COM.") === "com,example,news")
  }

  test("curated spellings: scheme prefix, wildcard, url paste, root dot") {
    assert(HostBlocklist.hostKey("https://example.com") === "com,example")
    assert(HostBlocklist.hostKey("*.example.com") === "com,example")
    assert(HostBlocklist.hostKey("http://user:pw@Example.com/path?q=1")
      === "com,example")
    assert(HostBlocklist.hostKey(".example.com.") === "com,example")
    // a scheme-prefixed entry actually BLOCKS (it used to mint the dead
    // key "https:" and enforce nothing)
    val kept = HostBlocklist.dropBlockedHosts(pages, "url",
      Seq("https://example.com")).select("url").as[String].collect().sorted
    assert(kept === Array(
      "http://notexample.com/d",
      "http://example.com.evil.org/e",
      "http://host.org/f").sorted)
  }

  test("null urls survive a non-empty blocklist (no host, no block)") {
    val withNull = pages.unionByName(
      Seq((null: String, "z")).toDF("url", "text"))
    val kept = HostBlocklist.dropBlockedHosts(withNull, "url", Seq("host.org"))
    assert(kept.filter("url is null").count() === 1L)
    assert(kept.count() === 6L) // 5 unblocked + the null row
  }

  test("a blocked domain covers non-default ports, both directions") {
    val ported = Seq(
      ("http://example.com:8080/spam", "apex on an odd port"),
      ("https://news.example.com:8443/x", "subdomain on an odd port"),
      ("http://host.org:8080/f", "unblocked host, odd port"))
      .toDF("url", "text")
    val kept = HostBlocklist.dropBlockedHosts(ported, "url", Seq("example.com"))
      .select("url").as[String].collect()
    assert(kept.toSeq === Seq("http://host.org:8080/f"))
    // a curated entry carrying a port blocks the domain on every port
    assert(HostBlocklist.hostKey("example.com:8080") === "com,example")
    assert(HostBlocklist.dropBlockedHosts(ported, "url", Seq("example.com:8080"))
      .count() === 1L)
  }

  test("plan: a per-row filter — no join, no exchange") {
    val plan = HostBlocklist.dropBlockedHosts(
      pages, "url", (1 to 500).map(i => s"blocked$i.test"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"blocklist must stay a scan-riding filter:\n$plan")
  }

  test("--block-hosts: blocked pages never enter state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-block-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-block-state").toString
    val listFile = java.nio.file.Files.createTempFile("graft-blocklist", ".txt")
    java.nio.file.Files.writeString(listFile,
      "# curated blocklist\nexample.com\n\nspam.test\n")
    Seq(
      ("http://news.example.com/a", "blocked page body text"),
      ("http://clean.test/b", "clean page body text"))
      .toDF("url", "text").write.mode("overwrite").parquet(dir.toString)
    Main.run(spark, Main.parse(Seq(
      "--pages", dir.toString, "--state", state,
      "--block-hosts", listFile.toString)).toOption.get)
    val ids = graft.state.Checkpoints.readSignatures(spark, state)
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("http://clean.test/b"))
  }
}
