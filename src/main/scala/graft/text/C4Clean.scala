package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style page cleaning (Raffel et al. 2020, §2.2) — the rule battery the
  * original web-text pipeline applies line-by-line before any dedup:
  *
  *   line kept  ⇔ ends in terminal punctuation (. ! ?, optionally
  *                quote-wrapped) or a bare closing quote,
  *                has >= `minWords` whitespace words, and does not mention
  *                javascript (the classic "enable JavaScript" chrome);
  *   page kept  ⇔ the CLEANED text still has >= `minSentences` terminal
  *                marks, and the ORIGINAL text contains neither
  *                "lorem ipsum" (case-insensitive) nor a curly brace
  *                (code/markup leak), nor any caller-supplied blocked word.
  *
  * The paper's dirty-word list is a parameter (`blockedWords`, default
  * empty) — shipping a slur list inside the engine is a policy decision the
  * caller owns, exactly like the reference keeps its skip-list external
  * (`config.rs` problematic-files analog).
  *
  * Scale shape: both rules are per-row array filters (split → lambda filter
  * → re-join) — zero exchange, whole-stage codegen, no UDFs; the battery
  * rides the scan like Repetition's. All predicates are RE2-compatible so
  * the DuckDB oracle replays them generically.
  */
object C4Clean {

  private val Trim = Repetition.Trim // ONE trim definition across the battery
  /** terminal punct (optionally quote-wrapped) OR a bare closing quote —
    * C4's _END_MARKS includes the quotation mark itself, so a dialogue
    * line like `He said "no more"` is KEPT (the punct-only spelling
    * silently dropped every quote-terminated line)
    */
  private val Terminal = "([.!?][\"']?|[\"'])$"

  /** Line-keep predicate over a TRIMMED line. */
  def keepLine(l: Column, minWords: Int = 3): Column =
    l.rlike(Terminal) &&
      size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords &&
      !lower(l).rlike("\\bjavascript\\b")

  /** Lines of `text` that survive the line rules, re-joined so the
    * document's PARAGRAPH structure survives cleaning: kept lines re-join
    * with '\n' inside each blank-line-delimited paragraph, paragraphs
    * whose every line dropped vanish, and surviving paragraphs re-join
    * with a blank line. A flat '\n' join here would erase the boundaries
    * the downstream paragraph election (`--para-dedup`) keys on —
    * FullBatterySpec pins the composition.
    */
  def cleanedText(text: Column, minWords: Int = 3): Column =
    array_join(
      filter(
        transform(split(text, ParagraphDedup.ParaSplit), p =>
          array_join(
            filter(transform(split(p, "\\n"), l => regexp_replace(l, Trim, "")),
              l => length(l) > 0 && keepLine(l, minWords)),
            "\n")),
        p => length(p) > 0),
      "\n\n")

  /** Terminal-mark count — the sentence proxy the page rule thresholds. */
  def sentenceCount(text: Column): Column =
    regexp_count(text, lit("[.!?]")).cast("long")

  /** Page-keep predicate: `cleaned` passes the sentence floor and `orig`
    * carries none of the page-level taints.
    */
  def keepPage(orig: Column, cleaned: Column, minSentences: Int = 5,
               blockedWords: Seq[String] = Nil): Column = {
    val lowerOrig = lower(orig)
    val blockedOk = blockedWords.foldLeft(lit(true)) { (acc, w) =>
      acc && !lowerOrig.rlike("\\b" + java.util.regex.Pattern.quote(w.toLowerCase) + "\\b")
    }
    sentenceCount(cleaned) >= minSentences &&
      !lowerOrig.contains("lorem ipsum") && !orig.contains("{") && blockedOk
  }

  /** Apply the battery: returns `df` with `textCol` replaced by the cleaned
    * text plus `n_lines`, `n_lines_kept`, `n_sentences`, `kept`. Dropped
    * pages stay in the frame with kept=false — filtering is the caller's
    * one-line decision (and keeps the audit trail the reference's
    * quarantine design insists on).
    */
  def clean(df: DataFrame, textCol: String, minWords: Int = 3,
            minSentences: Int = 5, blockedWords: Seq[String] = Nil): DataFrame = {
    df.withColumn("_lines", Repetition.linesOf(col(textCol)))
      .withColumn("_keptLines", filter(col("_lines"), l => keepLine(l, minWords)))
      .withColumn("_clean", cleanedText(col(textCol), minWords))
      .withColumn("n_lines", size(col("_lines")).cast("long"))
      .withColumn("n_lines_kept", size(col("_keptLines")).cast("long"))
      .withColumn("n_sentences", sentenceCount(col("_clean")))
      .withColumn("kept",
        keepPage(col(textCol), col("_clean"), minSentences, blockedWords))
      .withColumn(textCol, col("_clean"))
      .drop("_lines", "_keptLines", "_clean")
  }
}
