package graft

import org.apache.spark.sql.functions._

import graft.text.PiiScrub

/** A12 PII scrub: masking semantics, order guards, audit counts, the
  * per-row plan shape, and the CLI placement (scrubbed text is what
  * fingerprints — PII-only diffs dedup as duplicates).
  */
class PiiScrubSpec extends SparkTestBase {
  import spark.implicits._

  private def scrubOne(t: String): String =
    Seq(t).toDF("text").select(PiiScrub.scrub(col("text"))).head().getString(0)

  test("emails, IPv4s and phones mask; surrounding punctuation survives") {
    assert(scrubOne("Mail a.b+c%d@sub.example.co.uk, ok.") === "Mail <EMAIL>, ok.")
    assert(scrubOne("Host 192.168.0.1 and 10.1.200.7 up.") === "Host <IP> and <IP> up.")
    assert(scrubOne("Call 555-123-4567 or 555.123.4567!") === "Call <PHONE> or <PHONE>!")
    assert(scrubOne("Intl +4915112345678 works.") === "Intl <PHONE> works.")
    // terminal sentence period stays (TLD match stops before it)
    assert(scrubOne("Write to x@y.com.") === "Write to <EMAIL>.")
  }

  test("masking order guards: dotted quads never half-match as phones") {
    assert(scrubOne("ip 10.1.200.7") === "ip <IP>")
    // an email's digit-bearing domain masks as EMAIL, not IP or PHONE
    assert(scrubOne("u@10.1.200.7x.com") === "<EMAIL>")
  }

  test("non-PII text passes through byte-identical") {
    val t = "Version 1.2 beat 1.2.3 by 12 points over 1234567 runs."
    assert(scrubOne(t) === t)
  }

  test("scrubPages counts read the pre-scrub text with order guards") {
    val out = PiiScrub.scrubPages(Seq(
      ("d1", "a@b.com c@d.org 1.2.3.4 555-123-4567 +12345678901"),
      ("d2", "no pii here")).toDF("id", "text"), "text")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text") === "<EMAIL> <EMAIL> <IP> <PHONE> <PHONE>")
    assert(out(0).getAs[Long]("n_emails") === 2L)
    assert(out(0).getAs[Long]("n_ips") === 1L)
    assert(out(0).getAs[Long]("n_phones") === 2L)
    assert(out(1).getAs[Long]("n_emails") === 0L)
  }

  test("per-row plan: no exchange; --scrub-pii dedups PII-only diffs") {
    val plan = PiiScrub.scrubPages(
      spark.range(10).select($"id", concat(lit("t "), $"id").as("text")), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

    assert(Main.parse(Seq("--pages", "p", "--state", "s", "--scrub-pii"))
      .toOption.get.scrubPii)
    val dir = java.nio.file.Files.createTempDirectory("graft-pii-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-pii-state").toString
    Seq(
      ("http://a.test/1", "Contact alice@example.com for body text here."),
      ("http://a.test/2", "Contact bob@sample.org for body text here."))
      .toDF("url", "text").write.mode("overwrite").parquet(dir.toString)
    Main.run(spark, Main.parse(
      Seq("--pages", dir.toString, "--state", state, "--scrub-pii")).toOption.get)
    val hashes = graft.state.Checkpoints.readSignatures(spark, state)
      .select("content_hash").as[String].collect()
    assert(hashes.distinct.length === 1,
      "pages differing only in masked PII must share a content hash")
  }
}
