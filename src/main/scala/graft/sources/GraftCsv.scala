package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delimiter-CSV ingest — the engine analog of the reference's entry point
  * (/root/reference/dags/aggregates_python_helpers.py:183-197:
  * `read_csv(delimiter='#', names=column_names)` followed by
  * `to_datetime(..., errors='coerce')`). Spark-first shape:
  *
  *  - explicit schema (never inferSchema — schema inference is a full
  *    extra pass over 100 TB), with coercible timestamp columns declared
  *    STRING and converted after the scan;
  *  - PERMISSIVE mode with a corrupt-record column, so structurally bad
  *    lines survive as data (countable, quarantineable) instead of
  *    failing the job;
  *  - `try_to_timestamp` for the errors→null date coercion — malformed
  *    values become null without tripping ANSI evaluation.
  */
object GraftCsv {

  val CorruptCol = "_corrupt_record"

  /** Read a delimiter-CSV with an explicit schema. `timestampCols` must be
    * declared as STRING in `schema`; they come back as nullable timestamps
    * (malformed → null). The corrupt-record column is appended
    * automatically; [[badRecords]] / [[goodRecords]] split on it.
    *
    * `cacheForAudit`: Spark refuses scans whose required schema is ONLY the
    * corrupt-record column (a parse-time artifact can't be re-derived from a
    * column-pruned re-read), so corrupt-only queries like
    * `badRecords(df).count()` need the parsed frame persisted. Leave false
    * on the 100 TB path — there, split good/bad once and write both out.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "#", timestampCols: Seq[String] = Nil,
      header: Boolean = false, cacheForAudit: Boolean = false): DataFrame = {
    val withCorrupt =
      StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .option("delimiter", delimiter)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(path)
    val parsed = timestampCols.foldLeft(raw)((acc, c) =>
      acc.withColumn(c, coerceTimestamp(col(c))))
    if (cacheForAudit) parsed.cache() else parsed
  }

  /** errors→null timestamp coercion (`pd.to_datetime(..., errors='coerce')`
    * analog): parse or null, never throw.
    */
  def coerceTimestamp(c: Column): Column = try_to_timestamp(c)

  /** Structurally malformed lines (delimiter/arity/type failures). */
  def badRecords(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNotNull)

  /** Clean rows with the corrupt-record column dropped. */
  def goodRecords(df: DataFrame): DataFrame =
    df.where(col(CorruptCol).isNull).drop(CorruptCol)
}
