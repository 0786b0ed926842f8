package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Binary-classifier evaluation in the distributed shape — the audit
  * loop of every quality-filter model (a filter you can't score is a
  * filter you can't trust):
  *
  *  - **ROC AUC** via the Mann-Whitney rank statistic with the standard
  *    half-credit for ties. The corpus collapses to DISTINCT score
  *    values first (one groupBy with map-side combine), then a single
  *    bounded window over the score frame computes cumulative negative
  *    counts — AUC·(2PN) = Σ_s np(s)·(2·negBelow(s) + nn(s)), held as
  *    an exact 2×-scaled integer so tie half-credit never leaves
  *    integer arithmetic. No per-row global sort.
  *  - **Calibration bins** via ntile's exact closed form over the
  *    global rank index (cumulative counts per score + a per-score
  *    row_number) — the first (total mod k) tiles take ceil(total/k)
  *    rows, degenerate total < k gives one row per tile. Again no
  *    global row sort; the only unpartitioned window runs over the
  *    distinct-score frame.
  *
  * Everything is exact: DECIMAL(38,0) cross-multiplication, floor by
  * subtract-mod — engine-portable to the last digit (the q160 oracle
  * replays it all in SQL).
  */
object Eval {

  private val Dec38 = DecimalType(38, 0)

  /** AUC + k-bin calibration over `(idCol, scoreCol, labelCol)` rows —
    * label must be 0/1 integral. Output: one row per bin with `decile`
    * (1-based), `n`, `n_pos`, `pos_rate_x1e6`, and the global
    * `auc_x1e6` repeated (exact floor of 10⁶·AUC).
    */
  def rocAudit(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    val lbl = scored.select(col(idCol).as("eval_id"),
      col(scoreCol).as("s"), col(labelCol).cast("long").as("y"))
    val bys = lbl.groupBy(col("s")).agg(
      sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val wS = Window.orderBy("s")
    val cum = bys
      .withColumn("below_n", coalesce(sum(col("nn")).over(
        wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("below_all", coalesce(sum(col("np") + col("nn")).over(
        wS.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val tot = bys.agg(sum(col("np")).as("p"), sum(col("nn")).as("n"))
    val auc = cum.agg(sum(col("np").cast(Dec38) *
        (lit(2L) * col("below_n") + col("nn")).cast(Dec38)).as("num2"))
      .crossJoin(tot)
      .select(((col("num2") * lit(1000000L) -
        pmod(col("num2") * lit(1000000L),
          (col("p").cast(Dec38) * col("n") * 2L))) /
        (col("p").cast(Dec38) * col("n") * 2L))
        .cast("long").as("auc_x1e6"))
    val wd = Window.partitionBy("s").orderBy("eval_id")
    val withIdx = lbl
      .join(cum.select(col("s"), col("below_all")), Seq("s"))
      .withColumn("idx",
        col("below_all") + row_number().over(wd).cast("long"))
      .crossJoin(broadcast(tot.select((col("p") + col("n")).as("total"))))
    val deciled = withIdx
      .withColumn("qq", expr(s"total div $bins"))
      .withColumn("rr", col("total") % bins)
      .withColumn("decile",
        when(col("qq") === 0L, col("idx"))
          .when(col("idx") <= (col("qq") + 1L) * col("rr"),
            expr("(idx + qq) div (qq + 1)"))
          .otherwise(col("rr") +
            expr("(idx - (qq + 1) * rr + qq - 1) div qq")))
    deciled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("pos_rate_x1e6", expr("(1000000 * n_pos) div n"))
      .crossJoin(broadcast(auc))
      .select(col("decile"), col("n"), col("n_pos"),
        col("pos_rate_x1e6"), col("auc_x1e6"))
  }
}
