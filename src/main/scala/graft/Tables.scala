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
  /** `events.ts` has shipped in multiple physical parquet encodings:
    * TIMESTAMP(NANOS), which Spark's vectorized reader surfaces as a raw
    * nanosecond long under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set once at session build — GraftSession / Verify / Bench), and
    * timezone-naive TIMESTAMP_MICROS, which arrives as TimestampNTZType.
    * The loader adapts on the READ schema rather than assuming one layout:
    * LongType → floor nanos to Spark's microsecond precision; NTZ → cast
    * to session-zone TIMESTAMP (sessions pin UTC, so the instant equals
    * the naive wall-clock — identical values to the nanos path, and
    * `unix_millis`/`unix_timestamp` consumers keep working). Branching is
    * driver-side on the schema, before analysis — no per-row conditional.
    */
  def events: DataFrame = {
    val raw = table("events")
    val fixed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    spread(fixed)
  }
  def documents: DataFrame = spread(table("documents"))
  def embeddings: DataFrame = spread(table("embeddings"))
}
