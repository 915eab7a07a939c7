package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level exact dedup — the sub-document operation web-text
  * training pipelines run BEFORE document-level near-dup (CCNet /
  * RefinedWeb style): navigation chrome, cookie banners, license
  * boilerplate and syndicated blurbs repeat across thousands of pages
  * whose documents are NOT duplicates of each other, so document-level
  * clustering never removes them. Dropping repeated paragraphs corpus-wide
  * both cleans the training text and sharpens document-level MinHash (the
  * boilerplate shingles stop dominating signatures).
  *
  * Semantics (deterministic, oracle-checkable):
  *   - paragraphs = text split on blank lines (two-or-more newlines, CRLF
  *     or LF, with optional horizontal whitespace between them), trimmed;
  *     empty paragraphs vanish
  *   - identity = exact bytes of the trimmed paragraph (sha2-256)
  *   - the FIRST occurrence corpus-wide survives — ordered by
  *     (doc, position): the occurrence with the smallest (docOrder, pos)
  *     keeps the paragraph, every other occurrence drops it
  *   - a document's surviving paragraphs re-join with a blank line,
  *     preserving their original order
  *   - a document whose EVERY paragraph lost keeps its (paragraph-
  *     normalized) text unchanged: such a doc is wholly duplicated
  *     content, which is document-level dedup's job to cluster and act
  *     on — silently emptying it would route it to quarantine and hide
  *     the duplicate relation from the machinery built to record it
  *     (`n_dropped = n_paras` still marks it)
  *   - a document with ZERO non-empty paragraphs (empty, whitespace-only
  *     or null text) passes through with its text untouched and
  *     `n_paras = 0` — this pass never removes documents, only
  *     paragraphs (matching [[SpanDedup]]; the callers' join-back relies
  *     on every input id coming out the other side)
  *   - `idCol` must be unique per row (the pages-table contract; after
  *     `--canon-urls` collapse). Duplicate ids would interleave two
  *     documents' paragraphs into one rebuilt text.
  *
  * Scale shape: the first-occurrence election is a rank-1 filter over the
  * paragraph-hash window, which Spark executes as `WindowGroupLimit`
  * (spec-gated): map-side partial limits pass ≤1 row per hash per task,
  * so a paragraph repeated on 10^6 pages shuffles O(tasks) rows, not
  * O(occurrences). Per-doc totals and the rebuild are partial+final
  * hash aggregations keyed by doc — no skew (a doc owns its own
  * paragraphs). At 10^12-doc scale swap paragraph text in the election
  * shuffle for (hash, doc, pos) + a re-join if paragraph bytes dominate.
  *
  * Reference analog: none — the reference dedups whole files only; this
  * is the sub-document granularity web text adds (SURVEY §2 beyond-
  * reference rows).
  */
object ParagraphDedup {

  // a paragraph break = two-or-more newlines (LF or CRLF), tolerating
  // horizontal whitespace on the blank lines
  private[text] val ParaSplit = "[\\t \\r]*\\n(?:[\\t \\r]*\\n)+[\\t \\r]*"

  /** Per-paragraph exploded view: (docId, [carry...,] pos, para, para_hash).
    * Paragraph text is whitespace-trimmed with a regexp (Spark's `trim`
    * strips spaces only, not tabs/newlines).
    */
  def explodeParagraphs(df: DataFrame, idCol: String, textCol: String,
                        carry: Seq[String] = Nil): DataFrame = {
    df.select(col(idCol) +: carry.map(col) :+
        posexplode(split(col(textCol), ParaSplit)).as(Seq("pos", "para")): _*)
      .withColumn("para", regexp_replace(col("para"), "^\\s+|\\s+$", ""))
      .filter(length(col("para")) > 0)
      .withColumn("para_hash", sha2(col("para"), 256))
  }

  private def rebuild(as: String): Column =
    array_join(
      transform(array_sort(collect_list(struct(col("pos"), col("para")))),
        s => s.getField("para")),
      "\n\n").as(as)

  /** Documents with corpus-wide repeated paragraphs removed (first
    * occurrence by (orderCol, pos) survives; a fully-duplicated doc keeps
    * its text — see object doc). Output: idCol, `textCol` (cleaned),
    * n_paras, n_dropped.
    *
    * `seen` (one column `para_hash`) extends "corpus-wide" ACROSS epochs:
    * a hash present there already elected its winner in a prior epoch, so
    * every occurrence in THIS batch loses; only unseen hashes run the
    * within-batch election. [[winners]] over the same inputs is the set of
    * hashes this batch newly elected — the state append for the next epoch.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      orderCol: Option[Column] = None,
                      seen: Option[DataFrame] = None): DataFrame = {
    val ord = orderCol.getOrElse(col(idCol))
    val paras = explodeParagraphs(
      df.withColumn("_ord", ord), idCol, textCol, carry = Seq("_ord"))
    // per-doc totals + the paragraph-normalized full rebuild (served
    // verbatim when every paragraph lost)
    val totals = paras.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_paras"), rebuild("_full"))
    val keptPerDoc = elect(paras, seen).groupBy(col(idCol))
      .agg(count(lit(1)).as("_n_kept"), rebuild("_kept"))
    // base left-join from df itself (matching [[SpanDedup]]): a doc whose
    // text is empty, whitespace-only or null explodes to ZERO paragraphs
    // and is absent from `totals` — it must still come out the other side
    // with its text untouched, not silently vanish from the corpus
    df.select(col(idCol), col(textCol).as("_orig"))
      .join(totals, Seq(idCol), "left")
      .join(keptPerDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_kept"), col("_full"), col("_orig")).as(textCol),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        (coalesce(col("n_paras"), lit(0L)) -
          coalesce(col("_n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Winning occurrences: prior-epoch hashes drop entirely (their winner
    * lives in an earlier epoch's text), fresh hashes keep exactly their
    * first (orderCol, pos) occurrence. The anti-join runs BEFORE the
    * election so seen paragraphs never enter the window shuffle — against
    * a bucketed seen table only the batch side exchanges; the rank-1
    * FILTER then turns the window into a WindowGroupLimit (map-side ≤1
    * row per hash per task).
    */
  private def elect(paras: DataFrame, seen: Option[DataFrame]): DataFrame = {
    val fresh = seen match {
      case Some(s) => paras.join(s.select(col("para_hash")), Seq("para_hash"), "left_anti")
      case None    => paras
    }
    val w = Window.partitionBy("para_hash").orderBy(col("_ord").asc, col("pos").asc)
    fresh.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
  }

  /** The paragraph hashes this batch newly elects a winner for — one row
    * per fresh hash (winners are rank-1, so already distinct). Same
    * election as [[dedupParagraphs]] over the same inputs; persisting this
    * set as `seen` for the next epoch is what makes first-occurrence
    * semantics hold across a corpus processed in epochs.
    */
  def winners(df: DataFrame, idCol: String, textCol: String,
              orderCol: Option[Column] = None,
              seen: Option[DataFrame] = None): DataFrame = {
    val ord = orderCol.getOrElse(col(idCol))
    val paras = explodeParagraphs(
      df.withColumn("_ord", ord), idCol, textCol, carry = Seq("_ord"))
    elect(paras, seen).select(col("para_hash"))
  }
}
