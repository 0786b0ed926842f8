package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Adaptive recrawl scheduling from observed change history — Cho &
  * Garcia-Molina's frequency-of-change estimator ("Estimating Frequency
  * of Change", ACM TOIT 2003, public): a crawler that refetches every
  * URL at the same cadence wastes its politeness budget
  * (q113/q124) on pages that never change and goes stale on pages that
  * change hourly. From n observed refetch intervals of which X showed a
  * content change, the paper's bias-corrected Poisson-rate estimate is
  *
  *   λ̂ = −ln((n − X + 0.5) / (n + 0.5))
  *
  * (changes per interval; the +0.5 terms keep the estimator finite at
  * X = n — a page that changed every single time we looked). The
  * revisit policy buckets λ̂: ≥0.7 (change odds-on every interval) =
  * `hot`, ≥0.1 = `warm`, >0 = `cool`, 0 observed changes = `cold`; a
  * single fetch has no interval evidence and reports `unknown` with a
  * NULL rate.
  *
  * Determinism: the ratio is formed as (2(n−X)+1)/(2n+1) — integer
  * doubling instead of literal 0.5s, exact in double — and the ln
  * quantizes to DECIMAL(18,9) before the ×10⁶ scaling and floor (the
  * q58/q114 discipline), so the emitted integer rate replays
  * bit-for-bit externally.
  *
  * Scale shape: one window (per-URL lag over fetch_seq — partitioned by
  * URL, never global) feeding one groupBy; 16-byte change flags, never
  * page bytes. The change signal is a content HASH equality test, so
  * the history table a production crawler feeds this is (url, seq,
  * hash) — exactly what the q104 canonical-dedup pass already emits.
  */
object Recrawl {

  private val Dec = DecimalType(18, 9)

  /** Per-URL change-rate report over a fetch history. Output: url_id,
    * n_fetches, n_changes, lambda_x1e6 (NULL when n_fetches = 1),
    * revisit_bucket.
    */
  def changeRate(history: DataFrame, urlCol: String, seqCol: String,
      hashCol: String): DataFrame = {
    val w = Window.partitionBy(col("url_id")).orderBy(col("seq"))
    val prev = lag(col("ch"), 1).over(w)
    val agg = history
      .select(col(urlCol).as("url_id"), col(seqCol).as("seq"),
        col(hashCol).as("ch"))
      .withColumn("changed",
        when(prev.isNull, lit(0L))
          .otherwise((col("ch") =!= prev).cast("long")))
      .groupBy(col("url_id"))
      .agg(count(lit(1)).as("n_fetches"), sum(col("changed")).as("n_changes"))
    val n = col("n_fetches") - 1
    val x = col("n_changes")
    val lnq = log((n.minus(x) * 2 + 1).cast("double") /
      (n * 2 + 1).cast("double")).cast(Dec)
    agg
      .withColumn("lambda_x1e6",
        when(col("n_fetches") > 1,
          floor(lnq * -1000000).cast("long")))
      .withColumn("revisit_bucket",
        when(col("n_fetches") === 1, lit("unknown"))
          .when(col("lambda_x1e6") >= 700000L, lit("hot"))
          .when(col("lambda_x1e6") >= 100000L, lit("warm"))
          .when(col("lambda_x1e6") > 0L, lit("cool"))
          .otherwise(lit("cold")))
  }

  /** [[changeRate]] composed with FEED evidence — the estimator's cold
    * start: λ̂ from n fetch intervals is noise until n is a handful, but
    * a page advertising a feed (q134 discovers it, q135/[[graft.sources.Feeds]]
    * parses it) states its own change history. For URLs with fewer than
    * `minFetches` observations, the newest feed-item age (days at
    * `asOfDate`) sets the revisit bucket instead: ≤2 days = hot,
    * ≤7 = warm, ≤30 = cool, older = cold — the same day-granular
    * freshness ladder sitemap `<changefreq>` advertises, applied to
    * evidence the site cannot help publishing truthfully. History wins
    * as soon as it is thick enough; a thin-history URL with NO feed
    * keeps its history verdict (usually `unknown`).
    *
    * Output: changeRate's columns with the history verdict renamed
    * `history_bucket`, plus n_feed_items, feed_newest (date),
    * feed_age_days, feed_bucket, prior_source (history|feed), and the
    * composed `revisit_bucket`.
    *
    * Scale shape: both inputs aggregate to one row per URL on a
    * url-keyed shuffle each, and the composition join is on that same
    * key — co-partitioned, no extra exchange beyond the two aggs.
    */
  def scheduleWithFeedPrior(history: DataFrame, urlCol: String,
      seqCol: String, hashCol: String, feedItems: DataFrame,
      feedUrlCol: String, feedTsCol: String, asOfDate: String,
      minFetches: Int = 3): DataFrame = {
    require(minFetches >= 1, s"minFetches must be >= 1, got $minFetches")
    val cr = changeRate(history, urlCol, seqCol, hashCol)
      .withColumnRenamed("revisit_bucket", "history_bucket")
    val feed = feedItems
      .select(col(feedUrlCol).as("url_id"), col(feedTsCol).as("_ts"))
      .where(col("_ts").isNotNull)
      .groupBy(col("url_id"))
      .agg(count(lit(1)).as("n_feed_items"),
        max(col("_ts")).cast("date").as("feed_newest"))
    cr.join(feed, Seq("url_id"), "left")
      .withColumn("n_feed_items",
        coalesce(col("n_feed_items"), lit(0L)))
      .withColumn("feed_age_days",
        datediff(lit(asOfDate).cast("date"), col("feed_newest"))
          .cast("long"))
      .withColumn("feed_bucket",
        when(col("feed_age_days") <= 2L, lit("hot"))
          .when(col("feed_age_days") <= 7L, lit("warm"))
          .when(col("feed_age_days") <= 30L, lit("cool"))
          .when(col("feed_age_days").isNotNull, lit("cold")))
      .withColumn("prior_source",
        when(col("n_fetches") >= minFetches.toLong ||
          col("feed_bucket").isNull, lit("history"))
          .otherwise(lit("feed")))
      .withColumn("revisit_bucket",
        when(col("prior_source") === "feed", col("feed_bucket"))
          .otherwise(col("history_bucket")))
  }
}
