package graft

/** Regression tripwire: every declared query must ANALYZE against the real
  * test-data parquet. Fixture-based specs build their own frames, so a
  * silent change in the driver-generated data (e.g. the events.ts
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS flip between rounds 7 and 8) can
  * break queries at analysis time without a single red test. Forcing
  * `df.schema` runs the full analyzer — unresolved columns, type-mismatch
  * binary ops, bad casts all throw here — without executing anything, so
  * every registered query costs ~seconds in total.
  *
  * Kept as one test per query (registered dynamically) so a failure names
  * the query, not just "some query broke".
  */
class AnalysisSmokeSpec extends SparkSpec {
  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name analyzes against sf0.001 test data") {
      val df = SparkEntry.queries(name)(spark, sf0001)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }

  test("Tables.events adapts every historical ts encoding to TIMESTAMP") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.TimestampType
    // current data (TIMESTAMP_MICROS → NTZ on read → cast)
    assert(Tables(spark, sf0001).events.schema("ts").dataType == TimestampType)
    // legacy layout (TIMESTAMP(NANOS) under nanosAsLong → raw long): the
    // branch is dormant on current data, so pin it with a synthesized
    // fixture — a regeneration back to NANOS must keep loading
    val dir = java.nio.file.Files.createTempDirectory("events_nanos").toString
    spark.range(3).select(
        col("id").as("event_id"),
        (col("id") * 1000000000L + 1700000000000000000L).as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dir/events.parquet")
    val legacy = Tables(spark, dir).events
    assert(legacy.schema("ts").dataType == TimestampType)
    val got = legacy.select(unix_millis(col("ts"))).orderBy("ts")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1700000000000L, 1700000001000L, 1700000002000L),
      "nanos floor to micros must preserve the instant")
  }
}
