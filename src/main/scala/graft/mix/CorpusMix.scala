package graft.mix

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing — the training-data pipeline's LAST stage: after
  * cleaning and dedup, assemble the final mix by sampling each source
  * (crawl snapshot, language, domain bucket, quality tier) down to its
  * target weight or token budget.
  *
  * Every decision here is DETERMINISTIC and engine-replayable: a row's
  * fate depends only on (id, salt) and the per-source rate — never on
  * partitioning, row order, or an RNG — so a re-run over the same corpus
  * reproduces the mix bit-for-bit (the property that makes training data
  * auditable), and a second engine (the DuckDB oracle) can replay the
  * exact keep/drop set from the same SQL-expressible arithmetic.
  *
  * The uniform variate is [[u60]]: the first 15 hex digits of
  * sha256(id || salt) as a long in [0, 2^60). sha256 rather than
  * xxhash64 deliberately — both engines implement it identically, and a
  * crypto hash's uniformity does not depend on key distribution. The
  * keep decision compares in the INTEGER domain against a threshold
  * computed once from the rate (floor(rate * 2^60)), so no per-row
  * floating-point comparison can diverge between engines.
  *
  * Scale shape: rate-based sampling ([[sampleBySourceRates]]) is a pure
  * per-row filter over plan literals — zero exchange, rides the scan,
  * exactly like the host blocklist. Budget-derived rates
  * ([[mixByTokenBudget]]) add ONE aggregation pass (partial+final agg on
  * the source key, output = #sources rows — a config-sized result, the
  * documented driver action). Exact-budget truncation
  * ([[truncateToBudget]]) pays a per-source window instead; see its doc
  * for when that is worth it.
  *
  * Reference analog: none — the reference dedups a personal photo
  * library; corpus composition is what the training-data payload adds
  * (SURVEY §2 beyond-reference rows, A15).
  */
object CorpusMix {

  /** 2^60 as a Long (and exactly representable as a Double). */
  val Unit60: Long = 1L << 60

  /** Uniform 60-bit variate of (id, salt): first 15 hex digits of
    * sha256(id || salt), base-16 → long in [0, 2^60). DuckDB replay:
    * `CAST(('0x' || substr(sha256(id || salt), 1, 15)) AS UBIGINT)`.
    */
  def u60(id: Column, salt: String): Column =
    conv(substring(sha2(concat(id.cast("string"), lit(salt)), 256), 1, 15),
      16, 10).cast("long")

  /** The integer keep-threshold for a rate in [0, 1]: floor(rate * 2^60).
    * Computed ONCE (driver side) per source — IEEE-754 double arithmetic,
    * so any engine evaluating the same expression lands on the same long.
    */
  def thresholdFor(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    math.floor(rate * Unit60.toDouble).toLong
  }

  /** Assemble ONE corpus from several — real training mixes draw from
    * SEPARATE corpora (a crawl snapshot, a curated encyclopedia, a code
    * dump), not from one table's column: tag each frame with its corpus
    * name in `sourceCol` and union them by column NAME, missing columns
    * filling null (corpora rarely share more than (id, text) — the export
    * needs nothing else, and a shared extra column passes through where
    * present). The tag then keys every downstream mix decision
    * ([[sampleBySourceRates]] rates, [[mixByTokenBudget]] budgets,
    * [[upsampleBySourceRates]] epochs) exactly as a column-derived source
    * would.
    *
    * Scale shape: a union is a plan-level concatenation — zero exchange,
    * zero join; each branch keeps its OWN pushdown and column pruning
    * (a filter over the union dups into every branch's scan), and the tag
    * ships as a per-branch plan literal. Identity contract: the id column
    * must be unique ACROSS corpora (web-corpus ids are urls, which are;
    * corpora that can collide should pre-prefix ids with the corpus name)
    * — two corpora sharing an id would share every u60 draw downstream:
    * same keep/drop fate, same shard, adjacent rows.
    */
  def unionCorpora(corpora: Seq[(String, DataFrame)],
                   sourceCol: String = "source"): DataFrame = {
    require(corpora.nonEmpty, "unionCorpora needs at least one corpus")
    val names = corpora.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate corpus names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    corpora.map { case (name, df) => df.withColumn(sourceCol, lit(name)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Keep each row iff u60(id, salt) < floor(rate(source) * 2^60).
    * `rates` is a CONFIG artifact (a handful of curated weights), shipped
    * as plan literals — the filter is per-row, zero exchange. Sources
    * absent from the map get `defaultRate` (0.0 = an explicit mix: what
    * is not listed is not in the training set).
    */
  def sampleBySourceRates(df: DataFrame, idCol: String, sourceCol: String,
                          rates: Map[String, Double], salt: String,
                          defaultRate: Double = 0.0): DataFrame = {
    val thr = rates.foldLeft(lit(thresholdFor(defaultRate))) {
      case (acc, (src, r)) =>
        when(col(sourceCol) === src, lit(thresholdFor(r))).otherwise(acc)
    }
    df.filter(u60(col(idCol), salt) < thr)
  }

  /** Per-source outcome of a budgeted mix: measured size, the rate the
    * budget implies, and the expected token yield (rate sampling hits the
    * budget in expectation — binomial concentration makes the relative
    * error O(1/sqrt(docs)) at corpus scale).
    */
  case class MixStat(source: String, docs: Long, tokens: Long,
                     budget: Long, rate: Double)

  /** Mix by per-source TOKEN budgets: one aggregation pass measures each
    * source's token total, rates = min(1, budget / tokens), then the
    * per-row [[sampleBySourceRates]] filter. The agg output is
    * config-sized (#sources rows) — collecting it is this operator's one
    * driver action, exactly like reading a blocklist file.
    *
    * `tokensOf` defaults to the engine's whitespace token count
    * (DuckDB-replayable; q_token_count's oracle pins it).
    */
  def mixByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, budgets: Map[String, Long],
                       salt: String,
                       tokensOf: Column => Column =
                         graft.text.TextAnalysis.tokenCount)
      : (DataFrame, Seq[MixStat]) = {
    require(budgets.nonEmpty, "mix budgets must name at least one source")
    budgets.foreach { case (s, b) => require(b >= 0, s"budget for $s is negative") }
    // coalesce: a source whose every doc has null text sums to null, and
    // null-text docs budget as 0 tokens everywhere (the export contract) —
    // the driver read must never NPE on getLong
    val totals = df.groupBy(col(sourceCol).cast("string").as("source"))
      .agg(count(lit(1)).as("docs"),
        coalesce(sum(tokensOf(col(textCol))), lit(0L)).as("tokens"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stats = budgets.toSeq.sortBy(_._1).map { case (src, budget) =>
      val (docs, tokens) = totals.getOrElse(src, (0L, 0L))
      val rate = if (tokens <= 0L) 0.0
                 else math.min(1.0, budget.toDouble / tokens.toDouble)
      MixStat(src, docs, tokens, budget, rate)
    }
    val rates = stats.map(s => s.source -> s.rate).toMap
    (sampleBySourceRates(df, idCol, sourceCol, rates, salt), stats)
  }

  /** EXACT-budget truncation: order each source by u60 (a deterministic
    * uniform shuffle) and keep the longest prefix whose token sum stays
    * within the budget — `cumsum - tokens < budget`, i.e. the row that
    * CROSSES the budget is the last one kept, so the yield lands in
    * (budget - max_doc_tokens, budget + max_doc_tokens).
    *
    * Costs a per-source window (running sum ordered by u60): one exchange
    * on the source key, and a hot source concentrates on one partition —
    * at 10^12 docs run [[mixByTokenBudget]] at rate (1+ε)·budget/tokens
    * FIRST and truncate the ~budget-sized survivor set, so the window
    * only ever sees what fits. Sources absent from `budgets` drop.
    */
  def truncateToBudget(df: DataFrame, idCol: String, textCol: String,
                       sourceCol: String, budgets: Map[String, Long],
                       salt: String,
                       tokensOf: Column => Column =
                         graft.text.TextAnalysis.tokenCount): DataFrame = {
    require(budgets.nonEmpty, "mix budgets must name at least one source")
    val budget = budgets.foldLeft(lit(null).cast("long")) {
      case (acc, (src, b)) =>
        when(col(sourceCol) === src, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("_mix_u60").asc, col(idCol).asc)
    // null text budgets as 0 tokens (the export contract): the doc packs
    // into the prefix for free instead of nulling the cumsum comparison
    // and silently vanishing from exact mode only
    df.withColumn("_mix_u60", u60(col(idCol), salt))
      .withColumn("_mix_tok", coalesce(tokensOf(col(textCol)), lit(0L)))
      .withColumn("_mix_cum", sum(col("_mix_tok")).over(w))
      .filter(col("_mix_cum") - col("_mix_tok") < budget)
      .drop("_mix_u60", "_mix_tok", "_mix_cum")
  }

  /** Split an UP-sampling rate into (whole epochs, fractional-epoch keep
    * threshold): a document sees `whole` guaranteed epochs plus one more
    * iff u60(id, salt) < thr — i.e. copies(id) = whole + [u60 < thr],
    * E[copies] = rate. Same integer-domain arithmetic as [[thresholdFor]],
    * so both engines land on the same copy count for every id.
    */
  def copiesFor(rate: Double): (Long, Long) = {
    require(rate >= 0.0 && rate <= 4096.0,
      s"up-sampling rate must be in [0, 4096], got $rate")
    val whole = math.floor(rate).toLong
    (whole, thresholdFor(rate - whole))
  }

  /** UP-sampled mixing — rates may EXCEED 1: the standard data-recipe move
    * of repeating curated sources (e.g. an encyclopedia at 3.4 epochs)
    * while the crawl stays at ≤ 1. Each row is emitted copies(id) times
    * with an `epochCol` ordinal 0..copies-1, where copies = floor(rate) +
    * [u60(id, salt) < floor(frac(rate)·2^60)] — deterministic, so re-runs
    * reproduce the exact multiset and DuckDB replays it
    * (unnest(generate_series(0, copies-1)) ≡ Spark's explode(sequence)).
    *
    * Properties (MixSpec-pinned): for rate ≤ 1 this degenerates to
    * [[sampleBySourceRates]] plus a constant epoch-0 column (same keep
    * set — the fractional epoch IS the sample); raising a rate only ADDS
    * (id, epoch) pairs (the fractional keep-set nests by the threshold
    * order, the whole part appends ordinals), so recipe iteration is
    * monotone, never a reshuffle of what a smaller rate already chose.
    *
    * Scale shape: a per-row generator riding the scan — zero exchange,
    * zero join; the copies expression ships as plan literals like the
    * rate filter. Downstream, shard assignment must key on (id, epoch)
    * so repeats spread across shards (ShardedExport handles this when
    * given the epoch column).
    */
  def upsampleBySourceRates(df: DataFrame, idCol: String, sourceCol: String,
                            rates: Map[String, Double], salt: String,
                            defaultRate: Double = 0.0,
                            epochCol: String = "epoch"): DataFrame = {
    val (dWhole, dThr) = copiesFor(defaultRate)
    val whole = rates.foldLeft(lit(dWhole)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(copiesFor(r)._1)).otherwise(acc)
    }
    val thr = rates.foldLeft(lit(dThr)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(copiesFor(r)._2)).otherwise(acc)
    }
    val copies =
      whole + when(u60(col(idCol), salt) < thr, lit(1L)).otherwise(lit(0L))
    // explode(null) drops the row, so copies == 0 vanishes without a filter
    df.withColumn(epochCol,
      explode(when(copies >= lit(1L), sequence(lit(0L), copies - lit(1L)))))
  }

  /** Per-DOCUMENT rate sampling — the quality-weighted keep (CCNet /
    * FineWeb style): each row carries its own keep probability as an
    * integer PERMILLE column in [0, 1000] (derived upstream from a quality
    * score, a perplexity bucket, a site reputation — any oracled per-row
    * signal), and keeps iff
    *
    *   (u60(id, salt) >> 30) * 1000  <  rateMille << 30
    *
    * — pure integer arithmetic on a 30-bit slice of the variate, so the
    * decision is engine-replayable with zero float ops (P(keep) is within
    * 2^-30 of rateMille/1000, and EXACT at 0 and 1000: permille 0 keeps
    * nothing, 1000 keeps everything). Same scale shape as
    * [[sampleBySourceRates]]: a per-row filter riding the scan, zero
    * exchange; the permille expression is the caller's plan, typically
    * also scan-riding.
    */
  def sampleByRatePerMille(df: DataFrame, idCol: String, rateMille: Column,
                           salt: String): DataFrame =
    df.filter(
      shiftright(u60(col(idCol), salt), 30) * lit(1000L) <
        rateMille.cast("long") * lit(1L << 30))

  /** The corpus-scale EXACT-budget recipe [[truncateToBudget]]'s doc
    * prescribes, as one operator: measure token totals (one config-sized
    * agg), rate-sample each source at min(1, (1+headroom)·budget/tokens) —
    * the scan-riding filter — and truncate only the ~budget-sized survivor
    * set, so the per-source window never sees more than (1+headroom)·budget
    * tokens no matter how big the source is.
    *
    * The composition is EXACT, not approximate: threshold sampling keeps
    * precisely the u60-smallest fraction of each source, and truncation
    * takes the u60-ordered prefix — the same prefix order — so as long as
    * the sample's token supply reaches the budget crossing row, the result
    * is bit-identical to truncating the unsampled source (pinned by
    * MixSpec). The only failure mode is undershoot (the sample's total
    * falls short of the budget), with probability exp(−Θ(ε²·budget /
    * max_doc_tokens)) by Chernoff — negligible at corpus scale for
    * ε = 0.05; `failOnUndershoot` (default ON) DETECTS it for the price
    * of one aggregation over the ~budget-sized result and fails the job
    * loudly — a silent short mix masquerading as "exact" is worse than a
    * re-run with a bigger ε.
    */
  def sampleThenTruncate(df: DataFrame, idCol: String, textCol: String,
                         sourceCol: String, budgets: Map[String, Long],
                         salt: String, headroom: Double = 0.05,
                         tokensOf: Column => Column =
                           graft.text.TextAnalysis.tokenCount,
                         failOnUndershoot: Boolean = true): DataFrame = {
    require(headroom >= 0.0, s"headroom must be >= 0, got $headroom")
    val inflated = budgets.map { case (s, b) =>
      val inf = math.ceil(b.toDouble * (1.0 + headroom))
      s -> (if (inf >= Long.MaxValue.toDouble) Long.MaxValue else inf.toLong)
    }
    val (sampled, stats) =
      mixByTokenBudget(df, idCol, textCol, sourceCol, inflated, salt, tokensOf)
    val out =
      truncateToBudget(sampled, idCol, textCol, sourceCol, budgets, salt, tokensOf)
    if (failOnUndershoot) {
      // undershoot ⟺ the pre-sample actually CUT the source (rate < 1: the
      // unsampled remainder could have supplied more) AND the kept tokens
      // fall short of the budget (the crossing row never existed). A source
      // merely smaller than its budget keeps rate = 1 and passes.
      val rates = stats.map(s => s.source -> s.rate).toMap
      val srcTokens = stats.map(s => s.source -> s.tokens).toMap
      val keptTok = out
        .groupBy(col(sourceCol).cast("string").as("source"))
        .agg(coalesce(sum(tokensOf(col(textCol))), lit(0L)).as("tokens"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // a budgeted source with ZERO corpus tokens (absent, or empty) is
      // vacuously exact — truncating the full source also yields nothing,
      // and no headroom can ever change that — so it must not fail the job
      val short = budgets.toSeq.sortBy(_._1).collect {
        case (src, b) if srcTokens.getOrElse(src, 0L) > 0L &&
            rates.getOrElse(src, 0.0) < 1.0 &&
            keptTok.getOrElse(src, 0L) < b =>
          s"$src (kept ${keptTok.getOrElse(src, 0L)} of $b)"
      }
      if (short.nonEmpty) throw new IllegalStateException(
        "exact-budget undershoot: the pre-truncation sample ran out of " +
          s"tokens for ${short.mkString(", ")} — raise the headroom (ε) " +
          "and re-run; the result would NOT equal truncating the full source")
    }
    out
  }
}
