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
  *    values first (one groupBy with map-side combine), then the
  *    cumulative negative counts over the score order come from the
  *    RANGE-PARTITIONED prefix-sum build (below) — AUC·(2PN) =
  *    Σ_s np(s)·(2·negBelow(s) + nn(s)), held as an exact 2×-scaled
  *    integer so tie half-credit never leaves integer arithmetic.
  *  - **Calibration bins** via ntile's exact closed form over the
  *    global rank index (cumulative counts per score + a per-score
  *    row_number) — the first (total mod k) tiles take ceil(total/k)
  *    rows, degenerate total < k gives one row per tile.
  *
  * Scale shape (VERDICT r16 task 3): the r16 version ran BOTH
  * cumulative windows as unpartitioned `Window.orderBy(s)` — a
  * SinglePartition exchange over the distinct-score frame, which for
  * continuous per-document scores is ~N rows through ONE task at
  * 100 TB. The prefix sums now build the way PageRank's node index
  * does (graph/PageRank.scala nodeIndexFrame): range-partition by
  * score, window WITHIN each partition (parallel), add per-partition
  * start offsets computed from the partition TOTALS — a driver-side
  * frame bounded by the partition count, never by data — broadcast
  * back on. Byte-identical to the global window by construction;
  * PlanSpec asserts the build plans no SinglePartition exchange.
  *
  * Everything is exact: DECIMAL(38,0) cross-multiplication, floor by
  * subtract-mod — engine-portable to the last digit (the q160 oracle
  * replays it all in SQL). Degenerate single-class corpora divide by
  * the guarded max(2PN, 1) and report auc_x1e6 = 0 (ADVICE r16).
  */
object Eval {

  private val Dec38 = DecimalType(38, 0)

  /** The distributed exclusive prefix sums over the distinct-score
    * frame `bys` (s, np, nn): adds `below_n` (Σ nn at scores < s) and
    * `below_all` (Σ np+nn at scores < s), plus the GRAND totals
    * (N = Σ nn, P+N = Σ np+nn) that the offset build already collected
    * — [[rocAudit]] reads them instead of re-aggregating `bys` per
    * consumer (the r17 2-3× regression: `tot` re-ran the upstream
    * groupBy twice via its crossJoins). Split out un-checkpointed so
    * PlanSpec can assert it contains NO SinglePartition exchange.
    */
  private[graft] def cumBelow(bys: DataFrame): graft.etl.Prefix.Ranked =
    graft.etl.Prefix.withRankPrefixTotals(
      bys.withColumn("na", col("np") + col("nn")),
      orderCols = Seq("s"),
      valueCols = Seq("nn" -> "below_n", "na" -> "below_all")) match {
      case r => r.copy(df = r.df.select(col("s"), col("np"), col("nn"),
        col("below_n"), col("below_all")))
    }

  private[graft] def cumBelowFrame(bys: DataFrame): DataFrame =
    cumBelow(bys).df

  /** AUC + k-bin calibration over `(idCol, scoreCol, labelCol)` rows —
    * label must be 0/1 integral. Output: one row per bin with `decile`
    * (1-based), `n`, `n_pos`, `pos_rate_x1e6`, and the global
    * `auc_x1e6` repeated (exact floor of 10⁶·AUC; 0 on a single-class
    * corpus).
    */
  def rocAudit(scored: DataFrame, idCol: String, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    // materialize the (id, s, y) projection ONCE: it feeds both the
    // distinct-score groupBy and the calibration join, and the caller's
    // scoring pipeline behind it (q160: full NB train + corpus score) is
    // the expensive part — a narrow 3-column persist beats re-running it
    // per consumer at every scale
    val lbl = scored.select(col(idCol).as("eval_id"),
      col(scoreCol).as("s"), col(labelCol).cast("long").as("y"))
      .localCheckpoint(true)
    val bys = lbl.groupBy(col("s")).agg(
      sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    // LAZY lineage cut (the r17 eager localCheckpoint(true) here blocked
    // the pipeline for a full extra pass): both consumers — the AUC agg
    // and the calibration join — share one RDD, materialized by
    // whichever job runs first. The grand totals (P, N) come from the
    // Prefix offset scan for free; 2PN can exceed 2⁶³ at corpus scale so
    // it re-enters the plan as an exact DECIMAL(38,0) literal.
    val ranked = cumBelow(bys)
    val cum = ranked.df.localCheckpoint(false)
    val totN = ranked.totals("below_n")
    val totAll = ranked.totals("below_all")
    val totP = totAll - totN
    val pn2big = (BigInt(totP) * BigInt(totN) * 2).max(BigInt(1))
    val pn2 = lit(new java.math.BigDecimal(pn2big.bigInteger)).cast(Dec38)
    val auc = cum.agg(sum(col("np").cast(Dec38) *
        (lit(2L) * col("below_n") + col("nn")).cast(Dec38)).as("num2"))
      .select(((col("num2") * lit(1000000L) -
        pmod(col("num2") * lit(1000000L), pn2)) / pn2)
        .cast("long").as("auc_x1e6"))
    val wd = Window.partitionBy("s").orderBy("eval_id")
    val qq = totAll / bins
    val rr = totAll % bins
    val withIdx = lbl
      .join(cum.select(col("s"), col("below_all")), Seq("s"))
      .withColumn("idx",
        col("below_all") + row_number().over(wd).cast("long"))
    val deciled = withIdx
      .withColumn("decile",
        if (qq == 0L) col("idx")
        else when(col("idx") <= (qq + 1L) * rr,
            expr(s"(idx + $qq) div ($qq + 1)"))
          .otherwise(lit(rr) +
            expr(s"(idx - ($qq + 1) * $rr + $qq - 1) div $qq")))
    deciled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("pos_rate_x1e6", expr("(1000000 * n_pos) div n"))
      .crossJoin(broadcast(auc))
      .select(col("decile"), col("n"), col("n_pos"),
        col("pos_rate_x1e6"), col("auc_x1e6"))
  }
}
