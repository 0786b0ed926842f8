package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / ETL operators re-expressing the reference's transformation
  * surface (JakBiel/Building_permissions_ETL, dags/aggregates_python_helpers
  * .py) Spark-first. Every operator is a declarative DataFrame transform —
  * Catalyst handles pushdown/pruning; shuffles are called out per-op.
  */
object IncrementalLoad {

  /** The reference's incremental-load window (helpers.py:104-127,172-197):
    * first run loads everything before `execDate`; later runs load only
    * (first day of previous month, execDate). At scale this predicate lands
    * on the partition column, so a monthly-partitioned source prunes to ≤2
    * partitions instead of scanning history.
    */
  def dateWindow(df: DataFrame, dateCol: Column, execDate: Column,
      firstRun: Boolean): DataFrame =
    if (firstRun) df.where(dateCol < execDate)
    else {
      val windowStart = add_months(trunc(execDate, "month"), -1)
      df.where(dateCol > windowStart && dateCol < execDate)
    }
}

object StarJoin {

  /** Star-schema enrich: fact joined through a chain of dimensions, every
    * dimension broadcast (dims are small by definition; the fact side never
    * shuffles). `dims` is (dimDf, joinCondition) pairs applied left-to-right.
    */
  def enrich(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, "inner")
    }
}

object PivotAggregates {

  /** Pivot counts with REQUIRED explicit pivot values — the reference
    * discovers pivot columns from the data (helpers.py:429-481, pandas
    * pivot_table); at 100 TB an implicit `.pivot(col)` runs a distinct-scan
    * on the driver first, so graft makes the value list part of the API.
    * Missing combinations come back 0 (not null), matching SUM(CASE).
    */
  def countPivot(df: DataFrame, groupCol: String, pivotCol: String,
      pivotValues: Seq[String]): DataFrame = {
    val pivoted = df.groupBy(col(groupCol)).pivot(pivotCol, pivotValues).count()
    pivotValues.foldLeft(pivoted)((acc, v) =>
      acc.withColumn(v, coalesce(col(s"`$v`"), lit(0L))))
  }
}

object WindowedCounts {

  /** The reference builds 3m/2m/1m aggregates as three full scans + pivots
    * + two outer joins (helpers.py:349-362,535-553). graft computes all the
    * windows in ONE pass with conditional aggregation: a single shuffle on
    * the group keys, map-side partial aggregation, no joins.
    *
    * Returns one `cnt_{m}m` long column per requested month window, counting
    * rows with `anchor - m months <= dateCol < anchor`.
    */
  def monthWindowCounts(df: DataFrame, dateCol: Column, anchor: Column,
      monthsBack: Seq[Int], groupCols: Seq[String]): DataFrame = {
    val aggs = monthsBack.map { m =>
      sum(
        when(dateCol >= add_months(anchor, -m) && dateCol < anchor, 1L)
          .otherwise(0L)).as(s"cnt_${m}m")
    }
    df.where(dateCol >= add_months(anchor, -monthsBack.max) && dateCol < anchor)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

object DimAlign {

  /** Drop fact rows whose key has no match in the dimension — the
    * reference's "removing_false_records_from_aggregate" (helpers.py:573-587)
    * does a left merge + isin filter; Spark-first this is a left_anti /
    * left_semi join with the dim broadcast.
    */
  def keepMatched(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_semi")

  /** No broadcast hint here: the "dim" side of an anti-join can be a fact
    * table (e.g. "customers with no orders") — AQE picks the strategy.
    */
  def removeUnmatched(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String): DataFrame =
    fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")

  /** Emit every dimension row with its aggregate, zero-filled when the fact
    * side has no rows — the reference's "adding_empty_records_for_powiats
    * _with_zero_permissions" (helpers.py:589-633) via a pandas right merge +
    * concat; here one outer join + coalesce, dim side broadcast.
    */
  def zeroFill(dim: DataFrame, agg: DataFrame, dimKey: String, aggKey: String,
      zeroCols: Seq[String]): DataFrame = {
    val joined = broadcast(dim).join(agg, dim(dimKey) === agg(aggKey), "left")
    zeroCols
      .foldLeft(joined)((acc, c) => acc.withColumn(c, coalesce(col(c), lit(0L))))
      .drop(aggKey)
  }
}

object CodeCorrection {

  /** Result statuses, mirroring the reference's terc cleanse
    * (helpers.py:240-300): Matched = filled from a fallback source,
    * Unknown2 = prefix not in the valid dictionary, Ok = untouched valid.
    */
  val Ok = "Ok"
  val Matched = "Matched"
  val Unknown = "Unknown"
  val Unknown2 = "Unknown2"

  /** Generic code-correction cleanse:
    *  1. null/empty codes are filled from `fallback` (status Matched;
    *     unfillable → Unknown),
    *  2. codes one digit short are left-padded with '0' (terc 6→7 rule),
    *  3. the leading `prefixLen` digits must be in `validPrefixes`, else
    *     status Unknown2.
    * Pure narrow transformation — no shuffle, fully codegen'd; callers drop
    * non-Ok/Matched rows with `dropInvalid`.
    */
  def classify(df: DataFrame, codeCol: Column, fallback: Column, width: Int,
      prefixLen: Int, validPrefixes: Seq[String], outCode: String = "code",
      outStatus: String = "status"): DataFrame = {
    val rawEmpty = codeCol.isNull || length(trim(codeCol)) === 0
    val filled = when(rawEmpty, fallback).otherwise(codeCol)
    val padded = when(length(filled) === width - 1, concat(lit("0"), filled))
      .otherwise(filled)
    val prefixOk = substring(padded, 1, prefixLen).isin(validPrefixes: _*)
    val status = when(padded.isNull, Unknown)
      .when(!prefixOk, Unknown2)
      .when(rawEmpty, Matched)
      .otherwise(Ok)
    df.withColumn(outCode, padded).withColumn(outStatus, status)
  }

  def dropInvalid(df: DataFrame, statusCol: String = "status"): DataFrame =
    df.where(col(statusCol).isin(Ok, Matched))
}

object Ranking {

  /** Deterministic top-k per group: row_number over (orderCols, tieBreak) so
    * ties never make results run-dependent. One shuffle on the group key.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, orderCol: Column,
      tieBreak: Column, k: Int, rankName: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCol, tieBreak)
    df.withColumn(rankName, row_number().over(w).cast("long"))
      .where(col(rankName) <= k)
  }
}

object SchemaAlign {

  /** Union two frames by column name, zero-filling columns missing on either
    * side — the reference's BigQuery schema-evolution step (helpers.py:383-
    * 411) adds INTEGER 0 columns on both sides before appending.
    */
  def unionZeroFill(a: DataFrame, b: DataFrame): DataFrame = {
    val u = a.unionByName(b, allowMissingColumns = true)
    val missing =
      (a.columns.toSet -- b.columns.toSet) ++ (b.columns.toSet -- a.columns.toSet)
    missing.foldLeft(u)((acc, c) => acc.withColumn(c, coalesce(col(c), lit(0))))
  }
}

object Sessionize {

  /** Gap-based sessionization in one pass of window functions: a session
    * boundary is a gap > `gapMs` milliseconds; session ids are the running
    * sum of boundary flags. One shuffle on the user key; no driver state,
    * no mapGroups — stays in Tungsten.
    */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
      tieBreak: String, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val ms = unix_millis(col(tsCol))
    val prevMs = lag(ms, 1).over(byUser)
    val newSession =
      when(prevMs.isNull || ms - prevMs > gapMs, 1L).otherwise(0L)
    events
      .withColumn("session_seq",
        sum(newSession).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats on top of [[assignSessions]]. */
  def userSessionStats(events: DataFrame, userCol: String, tsCol: String,
      tieBreak: String, gapMs: Long): DataFrame =
    assignSessions(events, userCol, tsCol, tieBreak, gapMs)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), max(col("session_seq")).as("n_sessions"))
}

object TimeBuckets {

  /** Tumbling-bucket aggregation (batch twin of the streaming windowed agg):
    * truncate to the bucket, group once. Decimal-exact value sums via the
    * caller's agg columns.
    */
  def hourly(df: DataFrame, tsCol: String, aggs: Seq[Column],
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = col("bucket_ts") +: extraKeys.map(col)
    df.withColumn("bucket_ts", date_trunc("hour", col(tsCol)))
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}

object PartitionedSink {

  /** Monthly-partitioned, clustered parquet sink — the Spark analog of the
    * reference's BigQuery MONTH time-partitioning + clustering on terc
    * (helpers.py:726-736). `partitionBy(month)` gives partition pruning for
    * the incremental-load predicate; `sortWithinPartitions(clusterCol)`
    * gives parquet row-group min/max skipping on the cluster key.
    */
  def writeMonthly(df: DataFrame, dateCol: String, clusterCol: String,
      path: String): Unit =
    df.withColumn("p_month", date_format(col(dateCol), "yyyy-MM"))
      .repartition(col("p_month"))
      .sortWithinPartitions(col("p_month"), col(clusterCol))
      .write
      .mode("overwrite")
      .partitionBy("p_month")
      .parquet(path)
}
