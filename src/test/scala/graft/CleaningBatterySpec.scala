package graft

import org.apache.spark.sql.functions._

class CleaningBatterySpec extends SparkTestBase {
  import spark.implicits._

  test("parse: the three cleaning flags land in CliArgs") {
    val a = Main.parse(Seq("--pages", "/p", "--state", "/s",
      "--c4-clean", "--gopher-filter", "--span-dedup", "--para-dedup")).toOption.get
    assert(a.c4Clean && a.gopherFilter && a.spanDedup && a.paraDedup)
  }

  test("--c4-clean --gopher-filter --span-dedup --para-dedup compose end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-battery-pages")
    val state = java.nio.file.Files.createTempDirectory("graft-battery-state").toString
    val p1Sents = Seq(
      "Quick foxes jump over fences.",
      "Lazy dogs sleep near barns.",
      "Bright stars shine above hills.",
      "Green boats drift past docks.",
      "Small birds sing at dawn.")
    val p2Sents = Seq(
      "Heavy clouds gather before storms.",
      "Warm winds blow across plains.",
      "Old clocks tick inside halls.",
      "Tall trees sway behind walls.",
      "Cold rivers flow through valleys.")
    Seq(
      // p1: junk line dropped by the C4 line rule, the rest survives
      ("http://a.test/1",
        (p1Sents.take(2) :+ "no terminal punctuation junk line") // junk mid-doc
          .++(p1Sents.drop(2)).mkString("\n")),
      // p2: javascript chrome line dropped, the rest survives
      ("http://a.test/2",
        (p2Sents :+ "Please enable JavaScript to continue.").mkString("\n")),
      // p3: passes C4 but is Gopher-repetitive -> whole doc dropped
      ("http://a.test/3",
        (Seq.fill(8)("Subscribe to our newsletter today.")
          :+ "One unique closing sentence appears here.").mkString("\n")),
      // p4: embeds p1's first three sentences consecutively -> span dedup
      // drops exactly those three (p1 is first by url order)
      ("http://a.test/4",
        ("Fresh ideas arrive every morning. " + p1Sents.take(3).mkString(" ")
          + " Final thoughts settle by night.")),
      // p5: lorem ipsum -> page dropped at the C4 stage
      ("http://a.test/5",
        ("Sadly lorem ipsum fills this page. Second sentence stands alone. "
          + "Third thought arrives quickly. Fourth remark lands softly. "
          + "Fifth comment wraps up."))
    ).toDF("url", "text").write.mode("overwrite").parquet(dir.toString)

    val out = Main.run(spark, Main.parse(Seq(
      "--pages", dir.toString, "--state", state,
      "--c4-clean", "--gopher-filter", "--span-dedup", "--para-dedup"))
      .toOption.get)
    assert(out.head.contains("\"new_signatures\":3"), out.head)

    val expectedTexts = Seq(
      p1Sents.mkString(" "),
      p2Sents.mkString(" "),
      "Fresh ideas arrive every morning. Final thoughts settle by night.")
    val expected = expectedTexts.map { t =>
      Seq(t).toDF("t").select(
        graft.fingerprint.Fingerprints.contentHash(col("t"))).head().getString(0)
    }
    val sigs = graft.state.Checkpoints.readSignatures(spark, state)
    assert(sigs.select("content_hash").as[String].collect().sorted
      === expected.sorted.toArray)
  }
}
