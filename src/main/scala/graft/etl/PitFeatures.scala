package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time-correct feature join — training-set assembly without
  * label leakage: for every label event, trailing activity counts per
  * class over one or more look-back windows, computed STRICTLY BEFORE the
  * label timestamp (frame upper bound −1 microsecond, so activity at the
  * exact label instant never leaks into its own features — the classic
  * feature-store "as-of" contract; the reference's monthly windows,
  * helpers.py:323-533, are the batch cousin of the same cut).
  *
  * Shape: NOT a per-label range join (labels × activity explodes on hot
  * users). Labels and activity UNION into one stream with one-hot class
  * weights (labels weigh 0 everywhere, so they never count); every
  * feature is then a RANGE-frame windowed sum over the merged stream —
  * ONE user-keyed shuffle, ONE sort, all windows and classes in the same
  * pass (frames share partitioning+ordering, so Catalyst stacks them on
  * a single Window sort — the q5 one-pass rule applied to time travel).
  * Counts are integers and the frame bounds are exact microsecond
  * arithmetic, so any engine reproduces the result bit-for-bit (q87's
  * DuckDB oracle is the same union + WINDOW clause).
  *
  * Scale: the widest per-user window holds that user's events in the
  * longest look-back — bounded by activity rate, not corpus size; skewed
  * "bot" users are a data-quality cut upstream (q25), not a join
  * explosion here.
  */
object PitFeatures {

  /** Trailing per-class activity counts for each label row.
    *
    * `classes` are the activity classes to count (a one-hot weight column
    * each); `windows` are (suffix, seconds) look-backs. Output: one row
    * per label — (label_id, user_id, ts) plus a `<class>_<suffix>` long
    * column per (class, window), zero-filled where the frame is empty.
    */
  def trailingCounts(labels: DataFrame, labelId: Column, labelUser: Column,
      labelTs: Column, activity: DataFrame, actUser: Column, actTs: Column,
      actClass: Column, classes: Seq[String],
      windows: Seq[(String, Long)]): DataFrame = {
    require(classes.nonEmpty && windows.nonEmpty)
    val wCols = classes.map(c => s"w_$c")
    val acts = activity.select(
      (lit(null).cast("long").as("label_id") +:
        actUser.cast("long").as("user_id") +:
        lit(null).cast("timestamp").as("ts") +:
        unix_micros(actTs).as("m") +:
        classes.map(c =>
          when(actClass === c, 1L).otherwise(0L).as(s"w_$c"))): _*)
    val lbls = labels.select(
      (labelId.cast("long").as("label_id") +:
        labelUser.cast("long").as("user_id") +:
        labelTs.as("ts") +:
        unix_micros(labelTs).as("m") +:
        classes.map(c => lit(0L).as(s"w_$c"))): _*)
    val merged = acts.unionByName(lbls)
    val feats = windows.flatMap { case (suffix, secs) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("m"))
        .rangeBetween(-secs * 1000000L, -1L)
      classes.zip(wCols).map { case (c, wc) =>
        coalesce(sum(col(wc)).over(w), lit(0L)).as(s"${c}_$suffix")
      }
    }
    merged
      .select((col("label_id") +: col("user_id") +: col("ts") +: col("m") +:
        feats): _*)
      .where(col("label_id").isNotNull)
      .drop("m")
  }
}
