package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the test-data star schema: one parquet file per table under a
  * scale-factor directory. All operators read through here so every scan is
  * a plain parquet relation Catalyst can push filters/projections into.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects. Read it as raw long nanos and floor to Spark's native
    * microsecond precision. Requires `spark.sql.legacy.parquet.nanosAsLong
    * = true`, set ONCE at session build (GraftSession / Verify / Bench) —
    * mutating session conf per-read is racy under concurrent queries.
    */
  def events: DataFrame =
    table("events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
