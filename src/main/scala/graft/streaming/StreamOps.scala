package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
