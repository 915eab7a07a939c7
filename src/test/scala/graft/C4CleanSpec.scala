package graft

import org.apache.spark.sql.functions._

import graft.text.C4Clean

class C4CleanSpec extends SparkTestBase {
  import spark.implicits._

  private val goodPage = Seq(
    "This page opens with a proper sentence.",
    "short.",                                         // < 3 words
    "No terminal punctuation on this line",           // no terminal mark
    "Please enable JavaScript to continue reading.",  // javascript chrome
    "A second real sentence follows the chrome!",
    "Question lines also count as sentences, right?",
    "Quoted endings are terminal too, she said.\"",
    "And a fifth sentence closes the page.").mkString("\n")

  test("line rules: terminal punct, min words, javascript") {
    val out = C4Clean.clean(Seq((1L, goodPage)).toDF("id", "text"), "text")
      .select("text", "n_lines", "n_lines_kept", "n_sentences", "kept")
      .as[(String, Long, Long, Long, Boolean)].head()
    val (clean, nLines, nKept, nSent, kept) = out
    assert(nLines == 8 && nKept == 5)
    assert(!clean.contains("JavaScript") && !clean.contains("short.") &&
      !clean.contains("No terminal"))
    assert(nSent == 5 && kept)
  }

  test("quote-terminated dialogue lines are kept (C4 end marks include the quote)") {
    import org.apache.spark.sql.functions.{col, lit}
    def kept(line: String): Boolean =
      Seq(Tuple1(line)).toDF("l").select(C4Clean.keepLine(col("l"), 3).as("k"))
        .as[Boolean].head()
    assert(kept("He said \"no more\""))
    assert(kept("She answered 'fine then'"))
    assert(kept("He said \"no more.\""))
    assert(!kept("no terminal punctuation here at all"))
  }

  test("page rules: sentence floor, lorem ipsum, curly brace, blocked words") {
    val pages = Seq(
      (1L, goodPage),
      (2L, "Only one good sentence lives here.\nAnd a second one follows it."),
      (3L, goodPage + "\nSadly lorem ipsum dolor sits in this sentence."),
      (4L, goodPage + "\nvar config = { mode: 1 };"),
      (5L, goodPage + "\nThe casino bonus sentence tries to slip through."))
    val out = C4Clean.clean(pages.toDF("id", "text"), "text",
        blockedWords = Seq("casino"))
      .orderBy("id").select("kept").as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false, false, false))
  }

  test("empty and punctuation-free docs drop cleanly") {
    val out = C4Clean.clean(
        Seq((1L, ""), (2L, "word soup with no structure at all")).toDF("id", "text"),
        "text")
      .orderBy("id").select("text", "kept").as[(String, Boolean)].collect().toSeq
    assert(out == Seq(("", false), ("", false)))
  }

  test("clean is a shuffle-free narrow projection") {
    val plan = C4Clean.clean(
      spark.range(10).select($"id", lit(goodPage).as("text")), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
