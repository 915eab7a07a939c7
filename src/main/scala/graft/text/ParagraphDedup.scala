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
  *   - paragraphs = text split on blank lines (`\n{2,}` with optional
  *     horizontal whitespace between the newlines), trimmed; empty
  *     paragraphs vanish
  *   - identity = exact bytes of the trimmed paragraph (sha2-256)
  *   - the FIRST occurrence corpus-wide survives — ordered by
  *     (doc, position): the occurrence with the smallest (docOrder, pos)
  *     keeps the paragraph, every other occurrence drops it
  *   - a document's surviving paragraphs re-join with a blank line,
  *     preserving their original order
  *
  * Scale shape: one shuffle by paragraph hash (the window that elects the
  * first occurrence — rank-1 rides it as `WindowGroupLimit`, so a
  * paragraph repeated on 10^6 pages never materializes its group), then
  * one partial+final aggregation back to documents. Paragraph TEXT
  * travels the hash shuffle once; at 10^12-doc scale swap the exact text
  * for (hash, doc, pos) pairs + a re-join if paragraph bytes dominate —
  * both plans keep the wide column out of the window's sort buffer via
  * the same keys.
  *
  * Reference analog: none — the reference dedups whole files only; this
  * is the sub-document granularity web text adds (SURVEY §2 beyond-
  * reference rows).
  */
object ParagraphDedup {

  // a paragraph break = two-or-more newlines, tolerating horizontal
  // whitespace on the blank lines
  private val ParaSplit = "[\\t ]*\\n(?:[\\t ]*\\n)+[\\t ]*"

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

  /** Documents with corpus-wide repeated paragraphs removed (first
    * occurrence by (orderCol, pos) survives). Output: idCol,
    * `textCol` (cleaned), n_paras, n_dropped.
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
                      orderCol: Option[Column] = None): DataFrame = {
    val ord = orderCol.getOrElse(col(idCol))
    val paras = explodeParagraphs(
      df.withColumn("_ord", ord), idCol, textCol, carry = Seq("_ord"))
    // first occurrence corpus-wide: rank 1 over (hash) by (order, pos) —
    // WindowGroupLimit keeps mega-groups from materializing
    val w = Window.partitionBy("para_hash").orderBy(col("_ord").asc, col("pos").asc)
    val kept = paras.withColumn("_rn", row_number().over(w))
    val perDoc = kept
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        (count(lit(1)) - sum(when(col("_rn") === 1, 1L).otherwise(0L))).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(when(col("_rn") === 1,
              struct(col("pos"), col("para"))))),
            s => s.getField("para")),
          "\n\n").as(textCol))
    perDoc.select(col(idCol), col(textCol), col("n_paras"), col("n_dropped"))
  }
}
