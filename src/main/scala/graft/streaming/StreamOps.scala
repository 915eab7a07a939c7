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
