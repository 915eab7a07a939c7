package graft

import org.apache.spark.sql.functions._

import graft.text.Decontaminate

/** A13 benchmark decontamination: overlap semantics (any shared n-gram
  * drops the doc, straddling windows don't false-positive, short texts
  * contribute nothing), the broadcast-only plan, and the CLI wiring.
  */
class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private val run13 = "one two three four five six seven eight nine ten eleven twelve thirteen"

  test("a shared 13-gram drops the doc; partial overlap and short docs survive") {
    val docs = Seq(
      ("d1", s"Intro words here. $run13 closing remark."),
      ("d2", "one two three four five six seven eight nine ten eleven twelve"),
      ("d3", s"${run13.replace("thirteen", "altered")} tail"),
      ("d4", "tiny doc")).toDF("id", "text")
    val bench = Seq(s"Benchmark question: $run13?").toDF("btext")
    // the benchmark's trailing '?' glues onto 'thirteen', so only grams
    // fully inside the run match — d1 embeds the run with clean boundaries
    val benchClean = Seq(run13).toDF("btext")
    val kept = Decontaminate.decontaminate(docs, "id", "text", benchClean, "btext")
      .select("id").as[String].collect().sorted
    assert(kept === Array("d2", "d3", "d4"),
      "only the doc embedding the full 13-gram run drops")
    assert(Decontaminate.contaminatedIds(docs, "id", "text", benchClean, "btext")
      .as[String].collect().toSeq == Seq("d1"))
    // punctuation-glued benchmark tokens change the gram: nothing matches
    assert(Decontaminate.decontaminate(docs, "id", "text", bench, "btext")
      .count() === 4L)
  }

  test("case-insensitive: benchmark casing never saves a contaminated doc") {
    val docs = Seq(("d1", s"prefix ${run13.toUpperCase} suffix")).toDF("id", "text")
    val bench = Seq(run13).toDF("btext")
    assert(Decontaminate.decontaminate(docs, "id", "text", bench, "btext").isEmpty)
  }

  test("plan: both joins broadcast; the corpus side never exchanges") {
    val docs = Seq.tabulate(100)(i => (s"d$i", s"body $i " + run13))
      .toDF("id", "text")
    val bench = Seq(run13).toDF("btext")
    val planStr = Decontaminate.decontaminate(docs, "id", "text", bench, "btext")
      .queryExecution.executedPlan.toString
    assert(!planStr.contains("SortMergeJoin"),
      s"decontamination must never sort-merge:\n$planStr")
    assert("BroadcastHashJoin".r.findAllIn(planStr).size == 2,
      s"expected two broadcast joins:\n$planStr")
    // the only exchanges allowed are the two tiny aggregation sides
    // (distinct benchmark grams, distinct contaminated ids) — the corpus
    // text column must never key an exchange (ids-only currency)
    assert(!planStr.contains("hashpartitioning(text"),
      s"corpus text column entered an exchange:\n$planStr")
  }

  test("--decontaminate: contaminated pages never enter state") {
    val pages = java.nio.file.Files.createTempDirectory("graft-decon-pages")
    val benchDir = java.nio.file.Files.createTempDirectory("graft-decon-bench")
    val state = java.nio.file.Files.createTempDirectory("graft-decon-state").toString
    Seq(
      ("http://a.test/1", s"Leaked eval row: $run13 indeed."),
      ("http://a.test/2", "A perfectly clean training page body."))
      .toDF("url", "text").write.mode("overwrite").parquet(pages.toString)
    Seq(s"$run13").toDF("text")
      .write.mode("overwrite").parquet(benchDir.toString)
    Main.run(spark, Main.parse(Seq(
      "--pages", pages.toString, "--state", state,
      "--decontaminate", benchDir.toString)).toOption.get)
    val ids = graft.state.Checkpoints.readSignatures(spark, state)
      .select("id").as[String].collect()
    assert(ids.toSeq == Seq("http://a.test/2"))
  }
}
