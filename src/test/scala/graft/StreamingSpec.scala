package graft

import graft.etl.{Sessionize, TimeBuckets}
import graft.streaming._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming twins vs their batch counterparts via MemoryStream —
  * the SURVEY §2.28 gate.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("streaming hourly counts match the batch TimeBuckets result") {
    val events = Seq(
      (ts(10, 0), "click"), (ts(10, 30), "click"), (ts(10, 45), "view"),
      (ts(11, 5), "click"), (ts(12, 1), "view"))
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData(events: _*)
    val streamDf = EventAggregates.hourlyByType(
      mem.toDF().toDF("ts", "event_type"), "ts", "event_type")
    val q = streamDf.writeStream.format("memory").queryName("hourly_twin")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_twin")
      .select("bucket_ts", "event_type", "n")
      .as[(Timestamp, String, Long)].collect().toSet
    val batch = TimeBuckets.hourly(events.toDF("ts", "event_type"), "ts",
      Seq(count(lit(1)).as("n")), extraKeys = Seq("event_type"))
      .select(col("bucket_ts"), col("event_type"), col("n"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("stateful streaming sessionization matches the batch window-function result") {
    val events = Seq(
      SessionEvent(1L, ts(10, 0)), SessionEvent(1L, ts(10, 5)),
      SessionEvent(1L, ts(10, 50)), // gap > 30m → session 2
      SessionEvent(2L, ts(11, 0)))
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    mem.addData(events: _*)
    val out = StatefulSessionize.run(spark, mem.toDS(), gapMs = 1800000L)
    val q = out.writeStream.format("memory").queryName("session_twin")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("session_twin")
      .groupBy("user_id").agg(max("n_sessions").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val batch = Sessionize.userSessionStats(
      events.map(e => (e.user_id, e.ts, e.ts.getTime))
        .toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id", gapMs = 1800000L)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }
}
