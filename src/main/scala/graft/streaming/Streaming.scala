package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming twins of the batch event operators: watermarked
  * tumbling-window aggregation and stateful gap-based sessionization.
  * The batch versions (graft.etl.TimeBuckets / Sessionize) carry the
  * driver's correctness gate; these run the same logic incrementally.
  */
object EventAggregates {

  /** A file-based event stream with the given schema (parquet dir). */
  def readStream(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked hourly tumbling-window counts per event type. Late events
    * beyond the watermark are dropped; state is bounded by watermark age.
    */
  def hourlyByType(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 hour").as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("bucket_ts"), col(typeCol), col("n"))
}

final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
final case class SessionState(sessionCount: Long, lastMs: Long)
final case class UserSessions(user_id: Long, n_sessions: Long)

object StatefulSessionize {

  /** Stateful sessionization with flatMapGroupsWithState: per-user state is
    * (session count, last event time); a gap > gapMs opens a new session.
    * Emits the running per-user session count on every trigger (Update mode).
    */
  def run(spark: SparkSession, events: Dataset[SessionEvent],
      gapMs: Long): Dataset[UserSessions] = {
    import spark.implicits._
    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[UserSessions] = {
      var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
      it.toSeq.sortBy(e => e.ts.getTime).foreach { e =>
        val ms = e.ts.getTime
        if (st.lastMs == Long.MinValue || ms - st.lastMs > gapMs)
          st = SessionState(st.sessionCount + 1, ms)
        else st = st.copy(lastMs = ms)
      }
      state.update(st)
      Iterator.single(UserSessions(userId, st.sessionCount))
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
