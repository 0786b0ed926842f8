package graft

import graft.etl.Recrawl
import org.apache.spark.sql.functions._

/** Change-rate estimator corners (q128) — the oracle replays the corpus
  * plant; these pin the estimator arithmetic and edges by hand.
  */
class RecrawlSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)]) =
    Recrawl.changeRate(rows.toDF("u", "s", "h"), "u", "s", "h")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getString(4))).toMap

  test("hand-computed lambda: 2 changes over 4 intervals") {
    // hashes 1,1,2,2,3 → X=2, n=4; λ = −ln((2·2+1)/(2·4+1)) = ln(9/5)
    // = 0.587786664…; quantized ln(5/9) = −0.587786665 → floor gives
    // 587786 (the .665 fraction floors away)
    val r = run(Seq((7L, 0L, 1L), (7L, 1L, 1L), (7L, 2L, 2L),
      (7L, 3L, 2L), (7L, 4L, 3L)))
    assert(r(7L) == ((5L, 2L, Some(587786L), "warm")))
  }

  test("always-changing stays finite (the +1/2 correction) and hot") {
    // X = n = 2: λ = ln(5) = 1.609437… — the uncorrected MLE is ∞
    val r = run(Seq((1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L)))
    assert(r(1L) == ((3L, 2L, Some(1609437L), "hot")))
  }

  test("never-changing is cold; a single fetch is unknown evidence") {
    val r = run(Seq((1L, 0L, 5L), (1L, 1L, 5L), (1L, 2L, 5L),
      (2L, 0L, 9L)))
    assert(r(1L) == ((3L, 0L, Some(0L), "cold")))
    assert(r(2L) == ((1L, 0L, None, "unknown")))
  }

  test("change flags follow fetch_seq order, not input row order") {
    // shuffled input: ordered by seq the hashes are 1,2,2 → ONE change;
    // input order would see 2,1,2 → two
    val r = run(Seq((4L, 2L, 2L), (4L, 0L, 1L), (4L, 1L, 2L)))
    assert(r(4L)._2 == 1L, s"got ${r(4L)}")
  }

  test("feed prior fills thin history; thick history always wins") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 08:00:00")
    // url 1: ONE fetch (thin) + a 1-day-old feed -> feed says hot
    // url 2: one fetch, NO feed -> history verdict (unknown) survives
    // url 3: 4 never-changing fetches (thick, cold) + a fresh feed ->
    //        history wins, the feed cannot overrule real evidence
    // url 4: thin + 40-day-stale feed -> feed says cold
    val hist = (Seq((1L, 0L, 5L), (2L, 0L, 5L), (4L, 0L, 5L)) ++
      (0L to 3L).map(s => (3L, s, 7L))).toDF("u", "s", "h")
    // two items per feed; the NEWEST one must drive the age (and a
    // NULL-ts item must be ignored, not crash the max)
    val feed = Seq(
      (1L, ts("2024-02-14")), (1L, ts("2024-01-01")),
      (3L, ts("2024-02-15")),
      (4L, ts("2024-01-06")), (4L, null.asInstanceOf[java.sql.Timestamp])
    ).toDF("u", "t")
    val out = graft.etl.Recrawl.scheduleWithFeedPrior(
      hist, "u", "s", "h", feed, "u", "t", "2024-02-15", minFetches = 3)
      .collect().map(r => r.getAs[Long]("url_id") ->
        ((r.getAs[String]("prior_source"),
          r.getAs[String]("revisit_bucket"),
          r.getAs[Long]("n_feed_items")))).toMap
    assert(out(1L) == (("feed", "hot", 2L)))
    assert(out(2L) == (("history", "unknown", 0L)))
    assert(out(3L) == (("history", "cold", 1L)),
      "4 cold observations must beat a fresh feed")
    assert(out(4L) == (("feed", "cold", 1L)),
      "the NULL-ts item must not count and the stale feed buckets cold")
  }
}
