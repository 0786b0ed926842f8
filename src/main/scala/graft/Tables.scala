package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the test-data star schema: one parquet file per table under a
  * scale-factor directory. All operators read through here so every scan is
  * a plain parquet relation Catalyst can push filters/projections into.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** The test tables are ONE parquet file each, which Spark maps to ONE
    * input partition — so every per-row computation (minhash, simhash,
    * text stats, LSH codes) would run on a single core. Fact tables are
    * spread to the session's parallelism right after the scan; filters and
    * column pruning still push through the round-robin exchange, so the
    * shuffle carries only what downstream needs. A production deployment
    * reads pre-split sources (thousands of files/row-groups) and must NOT
    * blanket-repartition — this is the single-file-loader workaround, not
    * engine policy. Dimension tables stay unspread (they broadcast).
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = spread(table("orders"))
  def lineitem: DataFrame = spread(table("lineitem"))
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects. Read it as raw long nanos and floor to Spark's native
    * microsecond precision. Requires `spark.sql.legacy.parquet.nanosAsLong
    * = true`, set ONCE at session build (GraftSession / Verify / Bench) —
    * mutating session conf per-read is racy under concurrent queries.
    */
  def events: DataFrame =
    spread(table("events")).withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
  def documents: DataFrame = spread(table("documents"))
  def embeddings: DataFrame = spread(table("embeddings"))
}
