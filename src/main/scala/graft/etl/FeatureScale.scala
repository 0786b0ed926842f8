package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature scaling for training-data prep, integer-exact so any engine
  * reproduces the same scaled values (the q36/q78 rational-arithmetic
  * rule applied to normalization; fp `(x-min)/(max-min)` drifts in the
  * last ulp across engines).
  *
  * Scale shape: [[minMaxBp]] is ONE group-keyed shuffle and NO sort —
  * the min/max run as unbounded-frame window aggregates (no ORDER BY →
  * no sort, map-side partial min/max); [[equalFreqBins]] is one shuffle
  * + one sort (ntile needs the order), with the deterministic
  * (value, id) tie-break every ranked operator here uses.
  */
object FeatureScale {

  /** Per-group min-max scaling to integer BASIS POINTS: 0 at the group
    * min, 10000 at the group max, integral division in between —
    * engine-exact. Constant groups (max = min) scale to 0 by definition.
    * `valueCol` must be integer-valued (cast cents upstream for
    * decimals).
    */
  def minMaxBp(df: DataFrame, groupCol: Column, valueCol: Column,
      idCol: Column): DataFrame = {
    val w = Window.partitionBy(col("grp"))
    df.select(idCol.as("id"), groupCol.as("grp"),
        valueCol.cast("long").as("v"))
      .withColumn("_mn", min(col("v")).over(w))
      .withColumn("_mx", max(col("v")).over(w))
      .withColumn("scaled_bp",
        when(col("_mx") === col("_mn"), 0L)
          .otherwise(expr("((v - _mn) * 10000) div (_mx - _mn)")))
      .select("id", "grp", "v", "scaled_bp")
  }

  /** Per-group equal-frequency discretization: `bins` buckets of (as
    * near as possible) equal row count via ntile over the deterministic
    * (value, id) order — the standard quantile-binning feature, exact
    * and reproducible where interpolated-percentile cuts are not.
    */
  def equalFreqBins(df: DataFrame, groupCol: Column, valueCol: Column,
      idCol: Column, bins: Int): DataFrame = {
    require(bins >= 1)
    val w = Window.partitionBy(groupCol)
      .orderBy(valueCol.cast("long"), idCol)
    df.select(idCol.as("id"), groupCol.as("grp"),
        valueCol.cast("long").as("v"),
        ntile(bins).over(w).cast("long").as("bin"))
  }
}
