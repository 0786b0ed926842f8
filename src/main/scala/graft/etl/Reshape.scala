package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping and multi-grain aggregation.
  *
  * [[Unpivot]] is the inverse of [[PivotAggregates]] — the reference round-
  * trips its pivoted aggregate back to long form when re-reading the
  * warehouse table for the next incremental merge (helpers.py:535-553 works
  * on the wide frame; a consumer selecting one (unit, category) series needs
  * the melt). [[CubeAgg]] generalizes the q49 ROLLUP to all 2^n grains.
  */
object Unpivot {

  /** Melt `valueCols` into (variable, value) rows, keeping `idCols`.
    *
    * Scale shape: unpivot is a pure map-side expand (Catalyst `Expand` node
    * — each input row emits |valueCols| output rows in place). ZERO
    * shuffle, streams through whole-stage codegen; column pruning still
    * reaches the scan because the Expand projects only ids + valueCols.
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
      varName: String, valName: String): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valName)
}

object CubeAgg {

  /** CUBE over two dimensions in ONE shuffle: every grain —
    * (a, b), (a, ·), (·, b), (·, ·) — from a single pass with map-side
    * partial aggregation (Catalyst expands each input row once per grain
    * BEFORE the exchange, so partial aggregation compresses all grains
    * map-side; the alternative of 4 separate groupBys is 4 scans + 4
    * shuffles). `grain_id` is the standard GROUPING bitmask (bit set =
    * dimension rolled up), which disambiguates a genuine null dimension
    * value from a rolled-up one — coalescing nulls to 'ALL' alone cannot.
    */
  def cubeCounts(df: DataFrame, dimA: Column, dimB: Column,
      measure: Column): DataFrame =
    df.cube(dimA, dimB)
      .agg(grouping_id().cast("long").as("grain_id"),
        count(lit(1)).as("n"),
        graft.functions.F.exactSum2(measure).as("total"))
}
