package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis columns for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID heuristics and document
  * fingerprinting. All pure built-in column combinators (codegen'd, no
  * UDFs), deliberately expressible in ANSI SQL so every one is
  * DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column = {
    val t = trim(regexp_replace(text, "\\s+", " "))
    when(length(t) === 0, lit(0L)).otherwise(size(split(t, " ")).cast("long"))
  }

  /** Rough BPE-ish subword count: word-piece regex split — letters runs,
    * digit runs, and single punctuation all count (upper bound of a real
    * BPE tokenizer's piece count).
    */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long")
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", ""))).cast("long")

  def distinctTokenCount(text: Column): Column = {
    val t = trim(regexp_replace(text, "\\s+", " "))
    when(length(t) === 0, lit(0L))
      .otherwise(size(array_distinct(split(lower(t), " "))).cast("long"))
  }

  /** Composite quality score in [0,1]: favors mid-length docs with lexical
    * diversity and moderate punctuation (length/punct/diversity ratios —
    * standard web-text quality heuristics).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nDis = distinctTokenCount(text).cast("double")
    val nPun = punctCount(text).cast("double")
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val divScore = when(nTok === 0, lit(0.0)).otherwise(nDis / nTok)
    // the punctuation term is gated on nTok > 0 like the others: an
    // empty/blank document must score 0, not inherit the 0.1 no-penalty
    // bonus (a contentless doc would outscore all-punctuation text and
    // survive any threshold <= 0.1)
    val punTerm = when(nTok === 0, lit(0.0))
      .otherwise((lit(1.0) - least(nPun / greatest(nTok, lit(1.0)), lit(1.0))) * 0.1)
    round((lenScore * 0.4 + divScore * 0.5 + punTerm), 6)
  }

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "que", "es"))

  private def stopwordHits(text: Column, words: Seq[String]): Column = {
    // separator runs are DOUBLED before the non-overlapping " w " count so
    // adjacent stopwords never share a boundary space ("the the the" would
    // otherwise count 2 of 3: each match consumes both its spaces and the
    // next occurrence loses its leading one)
    val padded = concat(lit(" "), regexp_replace(lower(text), "\\s+", "  "), lit(" "))
    words.map(w => (size(split(padded, s" $w ")) - 1).cast("long")).reduce(_ + _)
  }

  /** N-gram/stopword-heuristic language ID: the language whose stopword
    * list scores the most padded-token hits; ties and zero hits → "und"
    * (undetermined). Deterministic, SQL-expressible.
    */
  def langId(text: Column): Column = {
    val scores = Seq("en", "de", "fr", "es").map(l => l -> stopwordHits(text, stopwords(l)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // later folds wrap earlier ones, so "en" is checked first: ties resolve
    // by the fixed priority en > de > fr > es
    scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Document fingerprint: sha2-256 of the whitespace/case-normalized text
    * (rolling-hash winnowing analog collapsed to its SQL-checkable core;
    * the shingle/minhash path in graft.fingerprint is the full version).
    */
  def docFingerprint(text: Column): Column =
    sha2(trim(regexp_replace(lower(text), "\\s+", " ")), 256)
}
