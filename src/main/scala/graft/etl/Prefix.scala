package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** The distributed global-rank/prefix-sum build, factored once (the
  * third use — PageRank's node index r11, Eval's score cumulatives
  * r17, the Lorenz report r17): a global
  * `row_number()/sum().over(Window.orderBy(...))` funnels every row
  * through ONE task — the classic zipWithIndex bottleneck at 10⁹ rows.
  * Instead: range-partition by the order columns (partition index
  * increasing with the key), rank and prefix-sum WITHIN each partition
  * (parallel windows), and add per-partition start offsets computed
  * from the partition TOTALS — a driver-side frame bounded by the
  * partition count, never by data — broadcast back onto the rows.
  * Reproduces the unpartitioned-window semantics byte-identically.
  */
object Prefix {

  /** [[withRankPrefixTotals]]'s result: the ranked frame plus the GRAND
    * totals the offset build already computed on the driver — callers
    * that previously re-aggregated the input just to learn its totals
    * (the r17 q160 regression: `bys.agg(sum…)` re-ran the whole
    * upstream groupBy once per consumer) read them here for free.
    */
  final case class Ranked(df: DataFrame, totalCount: Long,
      totals: Map[String, Long])

  /** Adds `idx` (1-based global rank over `orderCols` ascending) and,
    * per entry (c, alias) of `valueCols`, `<alias>` = the EXCLUSIVE
    * prefix sum of BIGINT column c in that order. Ties within
    * `orderCols` rank by their within-partition encounter order of the
    * remaining columns — pass a tiebreaker column in `orderCols` for a
    * total order (every caller does). The per-partition totals
    * collect to the driver: ≤ `spark.sql.shuffle.partitions` rows.
    */
  def withRankAndPrefix(df: DataFrame, orderCols: Seq[String],
      valueCols: Seq[(String, String)]): DataFrame =
    withRankPrefixTotals(df, orderCols, valueCols).df

  /** [[withRankAndPrefix]] plus the grand totals (total row count and,
    * per value alias, the column's full sum) as driver-side values —
    * they fall out of the per-partition offset scan at zero extra cost.
    */
  def withRankPrefixTotals(df: DataFrame, orderCols: Seq[String],
      valueCols: Seq[(String, String)]): Ranked = {
    // the build injects fixed working names; a caller whose frame (or
    // alias list) already uses one would be silently corrupted (ADVICE
    // r17) — fail loudly instead
    val reserved = "pid" +: "idx" +: "_off_idx" +:
      valueCols.map { case (_, a) => s"_off_$a" }
    val clash = df.columns.toSet
      .intersect(reserved.toSet ++ valueCols.map(_._2))
    require(clash.isEmpty,
      s"Prefix.withRankAndPrefix: input columns collide with reserved/" +
        s"output names ${clash.mkString(", ")} — rename them first")
    val aliases = valueCols.map(_._2)
    require(aliases.distinct.size == aliases.size &&
      !aliases.exists(a => a == "idx" || a == "pid"),
      s"Prefix.withRankAndPrefix: aliases must be unique and not " +
        s"'idx'/'pid' (got ${aliases.mkString(", ")})")
    // the aliases themselves must not collide with the WORKING names
    // either (ADVICE r18): an alias like "_off_idx" (or "_off_<other
    // alias>") passes the two requires above, then the final drop of
    // working names silently removes the caller's output column
    val aliasClash = aliases.filter(reserved.contains)
    require(aliasClash.isEmpty,
      s"Prefix.withRankAndPrefix: aliases collide with reserved working " +
        s"names ${aliasClash.mkString(", ")} — rename them")
    val spark = df.sparkSession
    val oc = orderCols.map(col)
    // materialize the input BEFORE the range exchange: RangePartitioning
    // samples its child to pick bounds, so an un-materialized input runs
    // its whole upstream pipeline an extra time just for the sample (the
    // r17 q160 regression's biggest constant). The snap is the grouped
    // frame — far smaller than whatever produced it.
    val snap = df.localCheckpoint(true)
    val stamped = snap.repartitionByRange(oc: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // snap existed only to keep the range sampler from re-running the
    // upstream pipeline; once `stamped` is materialized (eager, line
    // above) nothing reads snap again — release its blocks, or every
    // Prefix call pins a grouped-frame copy for the session's lifetime
    // (one of the r18 q175/q176 leak sites)
    org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoints(snap)
    val aggs = (count(lit(1)).as("_cnt") +:
      valueCols.map { case (c, a) => sum(col(c)).as(s"_t_$a") }).toList
    val parts = stamped.groupBy("pid").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        valueCols.indices.map(i => r.getLong(2 + i)).toArray))
      .sortBy(_._1)
    var runC = 0L
    val runV = Array.fill(valueCols.size)(0L)
    val offRows = parts.map { case (pid, c, vs) =>
      val row = Row.fromSeq(pid +: runC +: runV.toSeq)
      runC += c
      vs.indices.foreach(i => runV(i) += vs(i))
      row
    }
    val offSchema = StructType(
      StructField("pid", IntegerType, nullable = false) +:
        StructField("_off_idx", LongType, nullable = false) +:
        valueCols.map { case (_, a) =>
          StructField(s"_off_$a", LongType, nullable = false) })
    val offsets = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val w = Window.partitionBy("pid").orderBy(oc: _*)
    val wx = w.rowsBetween(Window.unboundedPreceding, -1)
    val withIdx = stamped.join(broadcast(offsets), "pid")
      .withColumn("idx",
        col("_off_idx") + row_number().over(w).cast("long"))
    val out = valueCols.foldLeft(withIdx) { case (d, (c, a)) =>
      d.withColumn(a,
        col(s"_off_$a") + coalesce(sum(col(c)).over(wx), lit(0L)))
    }.drop("pid" +: "_off_idx" +: valueCols.map { case (_, a) => s"_off_$a" }: _*)
    Ranked(out, runC,
      valueCols.zipWithIndex.map { case ((_, a), i) => a -> runV(i) }.toMap)
  }
}
