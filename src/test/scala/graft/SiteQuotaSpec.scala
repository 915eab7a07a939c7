package graft

import org.apache.spark.sql.functions._

import graft.text.SiteQuota

/** A11 per-site quota: SURT site identity, keep-priority semantics,
  * deterministic ties, the WindowGroupLimit plan shape, and the CLI
  * placement (over-quota pages never reach the pipeline or state).
  */
class SiteQuotaSpec extends SparkTestBase {
  import spark.implicits._

  test("respellings of one host share a quota; subdomains do not") {
    val pages = Seq(
      ("HTTPS://Example.COM:443/a", "a"),
      ("http://example.com/b", "b"),
      ("http://user@example.com:80/c", "c"),
      ("http://news.example.com/d", "d")).toDF("url", "text")
    val kept = SiteQuota.capPerSite(pages, "url", cap = 2)
      .select("url").as[String].collect().sorted
    // example.com holds 3 respelled pages -> 2 survive (url-asc default
    // priority); the subdomain is its own site and keeps its only page
    assert(kept === Array(
      "HTTPS://Example.COM:443/a",
      "http://example.com/b",
      "http://news.example.com/d").sorted)
  }

  test("keep-priority: the order columns decide, url breaks ties") {
    val pages = Seq(
      ("http://s.test/low", 1.0),
      ("http://s.test/high", 9.0),
      ("http://s.test/mid-b", 5.0),
      ("http://s.test/mid-a", 5.0)).toDF("url", "score")
    val kept = SiteQuota.capPerSite(pages, "url", cap = 3,
      order = Seq(col("score").desc))
      .select("url").as[String].collect().sorted
    // highest scores win; the 5.0 tie resolves to the smaller url
    assert(kept === Array(
      "http://s.test/high", "http://s.test/mid-a", "http://s.test/mid-b").sorted)
  }

  test("the election is a WindowGroupLimit (over-quota rows die map-side)") {
    val pages = Seq.tabulate(50)(i => (s"http://big.test/$i", s"t$i"))
      .toDF("url", "text")
    val capped = SiteQuota.capPerSite(pages, "url", cap = 5)
    assert(capped.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
    assert(capped.count() === 5L)
  }

  test("null urls are exempt from the quota, not silently capped") {
    val pages = Seq.tabulate(20)(i => (null: String, s"junk$i"))
      .toDF("url", "text")
      .unionByName(Seq.tabulate(10)(i => (s"http://s.test/$i", s"t$i"))
        .toDF("url", "text"))
    val kept = SiteQuota.capPerSite(pages, "url", cap = 3)
    // no site, no quota: all 20 null-url rows survive; the real site caps
    assert(kept.filter(col("url").isNull).count() === 20L)
    assert(kept.filter(col("url").isNotNull).count() === 3L)
  }

  test("duplicate urls (pre-dedup refetches) elect deterministically") {
    val pages = Seq(
      ("http://s.test/p", "first fetch body"),
      ("http://s.test/p", "refetched body"),
      ("http://s.test/q", "other page")).toDF("url", "text")
    val kept1 = SiteQuota.capPerSite(pages, "url", cap = 1)
      .select("url", "text").as[(String, String)].collect().toSet
    // a different physical layout must elect the SAME row — the row-hash
    // tiebreak, not partition arrival order, decides between refetches
    val kept2 = SiteQuota.capPerSite(pages.repartition(7), "url", cap = 1)
      .select("url", "text").as[(String, String)].collect().toSet
    assert(kept1 === kept2 && kept1.size === 1)
  }

  test("--site-cap: over-quota pages never enter state; parse validates") {
    assert(Main.parse(Seq("--pages", "p", "--state", "s", "--site-cap", "0")).isLeft)
    assert(Main.parse(Seq("--pages", "p", "--state", "s", "--site-cap", "x")).isLeft)
    val dir = java.nio.file.Files.createTempDirectory("graft-sitecap-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-sitecap-state").toString
    Seq(
      ("http://one.test/a", "alpha page text"),
      ("http://one.test/b", "beta page text"),
      ("http://two.test/c", "gamma page text"))
      .toDF("url", "text").write.mode("overwrite").parquet(dir.toString)
    Main.run(spark, Main.parse(
      Seq("--pages", dir.toString, "--state", state, "--site-cap", "1")).toOption.get)
    val ids = graft.state.Checkpoints.readSignatures(spark, state)
      .select("id").as[String].collect().sorted
    // one.test capped to its url-asc first page; two.test unaffected
    assert(ids === Array("http://one.test/a", "http://two.test/c").sorted)
  }
}
