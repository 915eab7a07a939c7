package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-shaped operators over the events table. The reference is pure
  * batch with persistent state (SURVEY.md §2.9), so the batch-incremental
  * path in graft.state is the primary incremental surface; these transforms
  * are written once and applied to BOTH `spark.read` (batch, oracle-checked)
  * and `spark.readStream` (Structured Streaming, exercised in the test
  * suite with watermark + windowed aggregation) — same DataFrame code.
  */
object StreamOps {

  /** Tumbling-hour aggregation per event_type. `sum_value_q` is a quantized
    * integer sum (exact, order-independent) so batch, streaming and the SQL
    * oracle agree to the bit.
    */
  def hourlyTypeAgg(events: DataFrame): DataFrame =
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy("hour", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum((round(col("value") * 1000).cast("long"))).as("sum_value_q"),
        approx_count_distinct(col("user_id")).as("approx_users"))

  /** Streaming variant: watermarked sliding window (the readStream path).
    * Kept separate because `date_trunc` groupBy is append-incompatible
    * without a watermark column.
    */
  def hourlyTypeAggStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((round(col("value") * 1000).cast("long"))).as("sum_value_q"))

  /** Sessionization: a new session starts after a >30 min gap per user.
    * Pure window functions — lag + conditional cumulative sum — the batch
    * formulation of mapGroupsWithState sessionization, and the shape used
    * at scale (one shuffle on user_id, no per-group state object).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L)
          .cast("long"))
      .withColumn("session_seq", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats from [[sessionize]] — count of sessions and
    * events per user (SQL-oracle-checkable).
    */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id")
      .agg(max("session_seq").as("n_sessions"), count(lit(1)).as("n_events"))

  /** Streaming sessionization via the built-in gap-based `session_window`
    * (the idiomatic Structured Streaming form of [[sessionize]]): one
    * session row per (user, session window), merged incrementally as events
    * arrive, closed by the watermark.
    */
  def sessionWindows(events: DataFrame, gapMinutes: Int = 30,
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  // ── streaming dedup (the engine's own domain, stream-shaped) ──────────

  /** Streaming EXACT dedup: first-seen page per content hash within the
    * watermark horizon. `dropDuplicatesWithinWatermark` keys state by the
    * hash alone and expires it with the watermark — bounded state, the
    * stream analog of the exact-first batch pass. On a BATCH frame (where
    * Spark rejects the streaming dedup operator, and "first seen" is
    * meaningless anyway) the same call keeps the deterministic min-id row
    * per hash instead.
    */
  def streamingExactDedup(pages: DataFrame, idCol: String, textCol: String,
                          tsCol: String, watermark: String = "1 hour"): DataFrame = {
    val hashed = pages.withColumn("content_hash",
      graft.fingerprint.Fingerprints.contentHash(col(textCol)))
    if (hashed.isStreaming)
      hashed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_hash")
    else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("content_hash").orderBy(col(idCol))
      hashed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
  }

  case class BandedSig(band: Int, band_hash: Long, id: String, simhash: Long)
  case class StreamPair(id_a: String, id_b: String, hamming: Int)

  /** Band a pages frame into the fast-path SimHash buckets (4 × 16-bit
    * slices — the same pigeonhole banding as `DedupPipeline.nearEdgesFast`)
    * as a typed stream. Pure projection + explode: stream-safe.
    */
  def bandedSimhash(pages: DataFrame, idCol: String, textCol: String,
                    bands: Int = 4): Dataset[BandedSig] = {
    import pages.sparkSession.implicits._
    pages.select(col(idCol).cast("string").as("id"),
        graft.fingerprint.Fingerprints.simhash(col(textCol)).as("simhash"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash",
        graft.lsh.LSH.slicedBandHash("simhash", "band", 64 / bands))
      .select("band", "band_hash", "id", "simhash").as[BandedSig]
  }

  /** Streaming NEAR-dup detection: incremental fast-path LSH via
    * `flatMapGroupsWithState` keyed by (band, band_hash). Per-bucket state
    * holds the (id, simhash) members seen so far (hard-capped, mirroring
    * `maxBucketSize` — a boilerplate mega-bucket saturates its cap instead
    * of growing without bound); each arriving doc is Hamming-verified
    * against its bucket's state and emits a pair per match. The same pair
    * can surface from several bands — downstream consumers dedupe, exactly
    * like the batch pair-distinct.
    */
  def streamingNearDupPairs(sigs: Dataset[BandedSig], maxHamming: Int = 3,
                            maxBucket: Int = 64): Dataset[StreamPair] = {
    import sigs.sparkSession.implicits._
    sigs
      .groupByKey(s => (s.band, s.band_hash))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandedSig], state: GroupState[List[(String, Long)]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[StreamPair]
          rows.foreach { r =>
            // at-least-once sources redeliver: an id already in state must
            // neither re-emit its pairs nor consume another capacity slot
            // (64 redeliveries would otherwise fill the cap with copies)
            if (!seen.exists(_._1 == r.id)) {
              seen.foreach { case (oid, osim) =>
                val h = java.lang.Long.bitCount(r.simhash ^ osim)
                if (h <= maxHamming) {
                  val (a, b) = if (r.id < oid) (r.id, oid) else (oid, r.id)
                  out += StreamPair(a, b, h)
                }
              }
              if (seen.size < maxBucket) seen = (r.id, r.simhash) :: seen
            }
          }
          state.update(seen)
          out.result().iterator
      }
  }

  case class UserEvent(user_id: Long, ts: Timestamp)
  case class UserCount(user_id: Long, n_events: Long)

  /** Custom streaming state via typed `mapGroupsWithState`: a running
    * per-user event counter that survives across micro-batches — the
    * KeyValueGroupedDataset custom-state surface (update-mode output; state
    * is one long per user, expirable by processing-time timeout in
    * production).
    */
  def runningUserCounts(events: Dataset[UserEvent]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[UserEvent], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + batch.size
          state.update(total)
          UserCount(user, total)
      }
  }
}
