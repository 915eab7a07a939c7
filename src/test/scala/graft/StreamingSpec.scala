package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured Streaming path: the same windowed-agg transform driven through
  * readStream (MemoryStream) must agree with the batch run on the same rows.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long, typ: String, v: Double) =
    Ev(id, new Timestamp(1700000000000L + minute * 60000L), user, typ, v)

  private val rows = Seq(
    ev(1, 0, 1, "click", 1.5), ev(2, 10, 1, "click", 2.5), ev(3, 20, 2, "view", 0.5),
    ev(4, 70, 1, "click", 3.0), ev(5, 80, 2, "view", 1.0), ev(6, 130, 3, "click", 7.25))

  test("streaming hourly agg (MemoryStream + watermark) matches batch on same rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(rows)

    val agg = StreamOps.hourlyTypeAggStreaming(stream.toDF())
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly_out").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("hourly_out")
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value_q"))
      .collect().map(_.toString).sorted

    val batch = StreamOps.hourlyTypeAgg(rows.toDF())
      .select(col("hour"), col("event_type"), col("n_events"), col("sum_value_q"))
      .collect().map(_.toString).sorted

    assert(streamed.sameElements(batch),
      s"streamed=${streamed.mkString(";")}\nbatch=${batch.mkString(";")}")
  }

  test("sessionize: 30-min gaps split sessions per user") {
    val stats = StreamOps.sessionStats(rows.toDF(), gapMinutes = 30)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // user 1: events at 0,10 | 70 → 2 sessions; user 2: 20 | 80 → 2; user 3: 130 → 1
    assert(stats.toSeq == Seq((1L, 2L, 3L), (2L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("streaming session_window sessionization agrees with batch session counts") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(rows)
    val q = StreamOps.sessionWindows(stream.toDF(), gapMinutes = 30)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sessions_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed.toSeq == Seq((1L, 2L, 3L), (2L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("mapGroupsWithState: running per-user counts accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.UserEvent]
    val counts = StreamOps.runningUserCounts(stream.toDS())
    val q = counts.toDF().writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ucounts_out").start()

    stream.addData(StreamOps.UserEvent(1, new Timestamp(1L)), StreamOps.UserEvent(1, new Timestamp(2L)))
    q.processAllAvailable()
    stream.addData(StreamOps.UserEvent(1, new Timestamp(3L)), StreamOps.UserEvent(2, new Timestamp(4L)))
    q.processAllAvailable()
    q.stop()

    // update mode emits one row per touched key per batch — the LAST row per
    // user carries the accumulated state
    val last = spark.table("ucounts_out").groupBy("user_id")
      .agg(max("n_events").as("n")).as[(Long, Long)].collect().sortBy(_._1)
    assert(last.toSeq == Seq((1L, 3L), (2L, 1L)))
  }
}
