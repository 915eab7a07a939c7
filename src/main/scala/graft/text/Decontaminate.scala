package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — drop training documents that overlap an
  * evaluation set (the GPT-3 appendix-C / Llama pretraining hygiene
  * pass): a document sharing any run of `n` consecutive words with any
  * benchmark text is contaminated and must not ship, or downstream evals
  * measure memorization.
  *
  * Identity: lowercased whitespace tokens (the same normalization as the
  * Gopher battery's word boundary), n-gram joined with single spaces,
  * keyed by `xxhash64` — 8-byte join currency, no gram text in any
  * exchange. Default n = 13 (GPT-3's choice). A text with fewer than `n`
  * tokens contributes no grams on either side.
  *
  * Scale shape: the benchmark side is small by nature (eval suites are
  * megabytes against a 100 TB corpus), so BOTH joins broadcast — the
  * corpus explodes its gram hashes map-side into a broadcast semi-join
  * (one scan, zero corpus shuffle), the surviving distinct contaminated
  * ids are tiny and broadcast back into the anti-join. Plan-gated by
  * DecontaminateSpec: zero SortMergeJoins, zero corpus-side Exchanges.
  * A collision (xxhash64 over ~10^6 benchmark grams) can only DROP an
  * extra clean doc at ~2^-64 per pair — never leak contamination.
  *
  * Reference analog: none — eval hygiene is what the webtext training
  * payload adds (SURVEY §2 round-5 deltas, A13).
  */
object Decontaminate {

  /** Distinct xxhash64 keys of the `n`-gram runs of `text`'s lowercased
    * whitespace tokens.
    */
  def gramHashes(text: Column, n: Int): Column = {
    require(n >= 2, s"decontamination n-gram order must be >= 2, got $n")
    val words = filter(split(lower(text), "\\s+"), w => length(w) > 0)
    when(size(words) < n, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(words) - lit(n - 1)),
        i => xxhash64(array_join(slice(words, i, lit(n)), " ")))))
  }

  /** Ids of documents sharing at least one `n`-gram with any benchmark
    * text — one column `idCol`, distinct.
    */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String,
                      n: Int = 13): DataFrame = {
    val benchGrams = bench
      .select(explode(gramHashes(col(benchTextCol), n)).as("_g"))
      .distinct()
    docs.select(col(idCol), explode(gramHashes(col(textCol), n)).as("_g"))
      .join(broadcast(benchGrams), Seq("_g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** `docs` with every contaminated document removed. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 13, broadcastIds: Boolean = true): DataFrame =
    docs.join(
      // NOTE: the id set is corpus-dependent, not structurally bounded —
      // benchmark prose that is widely mirrored on the web can mark a
      // large corpus fraction contaminated, and the forced broadcast
      // would then collect it all to the driver (8 GB hard cap / OOM).
      // Pass broadcastIds = false for mirror-heavy eval sets; the anti-
      // join then degrades to a shuffle, never a crash.
      (if (broadcastIds)
        broadcast(contaminatedIds(docs, idCol, textCol, bench, benchTextCol, n))
      else contaminatedIds(docs, idCol, textCol, bench, benchTextCol, n)),
      Seq(idCol), "left_anti")
}
