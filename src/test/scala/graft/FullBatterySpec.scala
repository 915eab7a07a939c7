package graft

import org.apache.spark.sql.functions._

/** The whole web-ingest battery composed at once — every round-5 flag in
  * one epoch, each operator provably acting on its own planted page:
  * `--canon-urls --block-hosts --site-cap --scrub-pii --decontaminate
  * --c4-clean --gopher-filter --para-dedup --span-dedup`.
  * Pipeline order under test: canon → blocklist → site quota → scrub →
  * decon → C4 → Gopher → paragraph dedup → span dedup (para before span:
  * the span rebuild sentence-normalizes, so it must not erase the
  * paragraph boundaries the para election keys on).
  */
class FullBatterySpec extends SparkTestBase {
  import spark.implicits._

  private val c1 = "Quick foxes jump over fences. Lazy dogs sleep near barns. Bright stars shine above hills. Green boats drift past docks. Small birds sing at dawn."
  private val c2 = "Heavy clouds gather before storms. Warm winds blow across plains. Old clocks tick inside halls. Tall trees sway behind walls. Cold rivers flow through valleys."
  private val c3 = "Young owls watch from towers. Ripe apples fall onto grass. Broad waves crash against rocks. Quiet mornings feel quite calm. Long roads wind through forests."
  private val bb = "Deep mines echo with sound. Fast trains race beyond cities. Thin smoke curls above chimneys. Soft moss grows beneath stones. Late ferries cross dark water."
  private val b5 = "Open markets hum with trade. Fresh bread cools on racks. Busy clerks count their coins. Loud bells mark every hour. Narrow lanes twist toward squares."
  private val shared4 = "Polite staff answer most questions. Simple forms take little time. Honest reviews help new buyers. Careful readers spot small errors."
  private val sentinel = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar november."
  private val deconBody = "Brave pilots chart long routes. Calm seas reward patient crews. Sturdy ships carry heavy loads. Keen eyes scan far horizons."
  private val lorem = "Sadly lorem ipsum fills this page. Second sentence stands alone. Third thought arrives quickly. Fourth remark lands softly. Fifth comment wraps up."
  private val sharedPara = "Shared short paragraph stays once. Second shared sentence follows."
  private val donorTail = "Distant drums announce the festival. Colored flags line the avenue. Eager crowds fill the plaza. Street vendors offer warm snacks. Night fireworks close the show."
  private val paraTail = "Winter gardens rest under frost. Patient growers plan spring beds. Stored seeds wait in jars. Clean tools hang on hooks. Short days end with tea."
  private val spanPage = "Fresh intro sentence arrives here. Quick foxes jump over fences. Lazy dogs sleep near barns. Bright stars shine above hills. Final thought settles tonight."

  private def hashOf(t: String): String =
    Seq(t).toDF("t")
      .select(graft.fingerprint.Fingerprints.contentHash(col("t")))
      .head().getString(0)

  test("all nine flags compose: each operator acts on its planted page") {
    val pages = java.nio.file.Files.createTempDirectory("graft-full-pages")
    val benchDir = java.nio.file.Files.createTempDirectory("graft-full-bench")
    val state = java.nio.file.Files.createTempDirectory("graft-full-state").toString
    val blockFile = java.nio.file.Files.createTempFile("graft-full-block", ".txt")
    java.nio.file.Files.writeString(blockFile, "# bad sites\nblocked.test\n")
    Seq(sentinel).toDF("text").write.mode("overwrite").parquet(benchDir.toString)

    Seq(
      ("http://blocked.test/1", bb),                           // blocklist drop
      ("http://capped.test/1", c1),                            // quota keep 1/2
      ("http://capped.test/2", c2),
      ("http://capped.test/3", c3),                            // over-quota drop
      ("HTTP://Canon.TEST:80/p?utm_source=x#frag", b5),        // respelling...
      ("http://canon.test/p", b5),                             // ...collapses
      ("http://pii-one.test/1",
        s"Contact alice@example.com for details today. $shared4"),
      ("http://pii-two.test/1",                                // PII-only diff
        s"Contact bob@other.org for details today. $shared4"),
      ("http://decon.test/1", s"$deconBody $sentinel"),        // eval overlap
      ("http://c4page.test/1", lorem),                         // C4 page taint
      ("http://gopher.test/1",                                 // repetitive
        (Seq.fill(8)("Subscribe to our newsletter today.")
          :+ "One unique closing sentence appears here.").mkString("\n")),
      ("http://para-donor.test/1", s"$sharedPara\n\n$donorTail"),
      ("http://para.test/1", s"$sharedPara\n\n$paraTail"),     // para loses ¶
      ("http://span.test/1", spanPage))                        // span loses run
      .toDF("url", "text").write.mode("overwrite").parquet(pages.toString)

    val out = Main.run(spark, Main.parse(Seq(
      "--pages", pages.toString, "--state", state,
      "--canon-urls", "--block-hosts", blockFile.toString, "--site-cap", "2",
      "--scrub-pii", "--decontaminate", benchDir.toString,
      "--c4-clean", "--gopher-filter", "--para-dedup", "--span-dedup"))
      .toOption.get)
    assert(out.head.contains("\"new_signatures\":8"), out.head)

    val stored = graft.state.Checkpoints.readSignatures(spark, state)
      .select("id", "content_hash").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stored.keySet === Set(
      "http://capped.test/1", "http://capped.test/2", "http://canon.test/p",
      "http://pii-one.test/1", "http://pii-two.test/1",
      "http://para-donor.test/1", "http://para.test/1", "http://span.test/1"))

    // untouched survivors keep their text verbatim
    assert(stored("http://capped.test/1") == hashOf(c1))
    assert(stored("http://capped.test/2") == hashOf(c2))
    assert(stored("http://canon.test/p") == hashOf(b5))
    // PII-only difference scrubs away: the two pages dedup as exact copies
    val piiClean = s"Contact <EMAIL> for details today. $shared4"
    assert(stored("http://pii-one.test/1") == hashOf(piiClean))
    assert(stored("http://pii-two.test/1") == stored("http://pii-one.test/1"))
    // span dedup removed exactly the run shared with capped.test/1
    assert(stored("http://span.test/1") ==
      hashOf("Fresh intro sentence arrives here. Final thought settles tonight."))
    // the 2-sentence shared paragraph is invisible to 3-spans but the para
    // election (running FIRST, on intact boundaries) dropped the copy; the
    // donor keeps both paragraphs, span-flattened to single spaces
    assert(stored("http://para-donor.test/1") == hashOf(s"$sharedPara $donorTail"))
    assert(stored("http://para.test/1") == hashOf(paraTail))
  }
}
