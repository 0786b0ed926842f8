package graft

/** Regression tripwire: every declared query must ANALYZE against the real
  * test-data parquet. Fixture-based specs build their own frames, so a
  * silent change in the driver-generated data (e.g. the events.ts
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS flip between rounds 7 and 8) can
  * break queries at analysis time without a single red test. Forcing
  * `df.schema` runs the full analyzer — unresolved columns, type-mismatch
  * binary ops, bad casts all throw here — without executing anything, so
  * the whole 97-query surface costs ~seconds.
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
}
