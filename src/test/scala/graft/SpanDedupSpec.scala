package graft

import graft.text.SpanDedup

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], window: Int = 3) =
    SpanDedup.dedupSpans(docs.toDF("id", "text"), "id", "text", window)
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq

  test("cross-doc duplicated 3-sentence span drops from every doc but the first") {
    val shared = "Shared one. Shared two. Shared three."
    val out = run(Seq(
      (1L, s"Alpha a. Beta b. $shared Gamma c."),
      (2L, s"Delta d. $shared Epsilon e."),
      (3L, s"$shared Zeta f.")))
    assert(out(0) == ((1L, "Alpha a. Beta b. Shared one. Shared two. Shared three. Gamma c.", 6L, 0L)))
    assert(out(1) == ((2L, "Delta d. Epsilon e.", 5L, 3L)))
    assert(out(2) == ((3L, "Zeta f.", 4L, 3L)))
  }

  test("docs shorter than the window pass through untouched") {
    val out = run(Seq((1L, "Only two. Sentences here."),
      (2L, "Only two. Sentences here.")))
    assert(out == Seq((1L, "Only two. Sentences here.", 2L, 0L),
      (2L, "Only two. Sentences here.", 2L, 0L)))
  }

  test("within-doc repeated span keeps only the first occurrence") {
    val out = run(Seq(
      (1L, "Ad one. Ad two. Ad three. Filler x. Ad one. Ad two. Ad three.")))
    // second occurrence (positions 4-6) drops; first stays
    assert(out.head == ((1L, "Ad one. Ad two. Ad three. Filler x.", 7L, 3L)))
  }

  test("wholly-duplicated doc keeps its normalized text, marked fully dropped") {
    val s = "Copy a. Copy b. Copy c."
    val out = run(Seq((1L, s"Original intro. $s"), (2L, s)))
    assert(out(1)._2 == s && out(1)._4 == 3L) // text preserved, all 3 dropped
  }

  test("overlapping occurrences inside one doc collapse to the leading run") {
    // A. A. A. A. with w=3: spans at pos 0 and 1 share a hash; pos 1 loses
    // and covers sentences 1-3 — only sentence 0 survives
    val out = run(Seq((1L, "Rep. Rep. Rep. Rep.")))
    assert(out.head == ((1L, "Rep.", 4L, 3L)))
  }

  test("empty and sentence-free docs survive as empty/identity rows") {
    val out = run(Seq((1L, ""), (2L, "no terminal punct at all"),
      (3L, "Pad one. Pad two. Pad three.")))
    assert(out(0) == ((1L, "", 0L, 0L)))
    assert(out(1) == ((2L, "no terminal punct at all", 1L, 0L)))
    // zero-sentence docs pass through UNTOUCHED — whitespace-only text is
    // not rewritten to "" and a null text stays null (the documented
    // contract, matching ParagraphDedup's _orig fallback)
    val ws = run(Seq((1L, "  \n \t "), (2L, null.asInstanceOf[String]),
      (3L, "Pad one. Pad two. Pad three.")))
    assert(ws(0) == ((1L, "  \n \t ", 0L, 0L)))
    assert(ws(1) == ((2L, null, 0L, 0L)))
  }

  test("election shuffle carries span hashes, not span text") {
    val df = SpanDedup.dedupSpans(
      Seq((1L, "One a. Two b. Three c. Four d.")).toDF("id", "text"),
      "id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(h#"),
      s"expected the election to exchange on the span hash:\n$plan")
  }
}
