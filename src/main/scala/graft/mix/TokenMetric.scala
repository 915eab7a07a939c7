package graft.mix

import org.apache.spark.sql.Column

/** The token-counting seam for the export surface: budgets, `n_tokens`,
  * and the pack plan all count in ONE configured unit. "ws" (whitespace
  * words — the default, cheapest, and what the oracles replay) or
  * "subword" (the BPE-ish word-piece count — an upper bound of a real
  * tokenizer's piece count, the right unit when budgets are stated in
  * model tokens). Both are oracled per-row by `q_token_count`; the chosen
  * metric is recorded in the export manifest so a loader knows what
  * `n_tokens` means.
  */
object TokenMetric {
  val Names: Set[String] = Set("ws", "subword")

  def of(name: String): Column => Column = name match {
    case "ws"      => graft.text.TextAnalysis.tokenCount
    case "subword" => graft.text.TextAnalysis.subwordCount
    case other =>
      throw new IllegalArgumentException(
        s"unknown token metric: $other (expected ${Names.mkString("/")})")
  }
}
