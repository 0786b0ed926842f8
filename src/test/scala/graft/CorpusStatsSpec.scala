package graft

import graft.etl.CorpusStats

/** Heaps-law growth audit (q140) — the oracle proves the corpus run;
  * these pin the checkpoint/regression arithmetic on a hand-built
  * corpus where every number is computable by hand.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // 2 checkpoints over 4 docs: dec 0 = docs {0,1}, dec 1 = docs {2,3}
  private def corpus = Seq(
    (0L, "a b"), (1L, "a c"), (2L, "a b"), (3L, "a d e")
  ).toDF("doc_id", "text")

  test("cumulative tokens and first-occurrence vocabulary per checkpoint") {
    val rows = CorpusStats.heapsGrowth(corpus, "doc_id", "text", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // tokens: 2+2 | +2+3; vocab by first occurrence: {a,b,c} | +{d,e}
    assert(rows.toSeq == Seq((1L, 4L, 3L), (2L, 9L, 5L)), rows.toSeq)
  }

  test("micro-beta equals the hand regression over milli-quantized lns") {
    def lnMilli(v: Long) =
      math.floor(BigDecimal(math.log(v.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000).toLong
    val xs = Seq(lnMilli(4), lnMilli(9)); val ys = Seq(lnMilli(3), lnMilli(5))
    val n = 2L
    val num = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) * 1000000L
    val den = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val expect = Math.floorDiv(num, den)
    val beta = CorpusStats.heapsGrowth(corpus, "doc_id", "text", buckets = 2)
      .select("heaps_beta_x1e6").distinct().as[Long].collect()
    assert(beta.toSeq == Seq(expect), s"beta ${beta.toSeq} vs $expect")
  }

  test("fewer than two checkpoints is refused") {
    intercept[IllegalArgumentException] {
      CorpusStats.heapsGrowth(corpus, "doc_id", "text", buckets = 1)
    }
  }

  test("lorenzReport: Lorenz laws — monotone cumulative, exact bin fold, partition independence") {
    // 25 groups with token masses 1..25 (group gK carries K tokens)
    val w = (1 to 25).flatMap(k => (0 until k).map(_ => (f"g$k%02d", 1L)))
      .toDF("src", "t")
    val rep = CorpusStats.lorenzReport(w, "src", "t", bins = 5)
      .orderBy("bin").collect()
    assert(rep.map(_.getAs[Long]("bin")).toSeq == (1L to 5L),
      "five bins, 1-based")
    assert(rep.map(_.getAs[Long]("n_groups")).toSeq == Seq.fill(5)(5L),
      "25 groups split 5 per bin")
    // ascending-mass bins: bin b holds masses 5(b-1)+1..5b
    val tokens = rep.map(_.getAs[Long]("tokens")).toSeq
    assert(tokens == Seq(15L, 40L, 65L, 90L, 115L), s"got $tokens")
    val cum = rep.map(_.getAs[Long]("cum_share_x1e6")).toSeq
    assert(cum == Seq(15L, 55L, 120L, 210L, 325L),
      s"cumulative edges in raw units at tiny W (sdiv = 1): $cum")
    // the staged divisor at tiny W: sdiv = fdiv(325, 1e6)+1 = 1, so
    // share_x1e6 degrades to raw tokens — the documented behavior
    // (shares are x1e6-meaningful once W ≥ 1e6; see the W=2e6 case)
    assert(rep.map(_.getAs[Long]("share_x1e6")).toSeq == tokens)
    // at W ≥ 1e6 the shares become real millionths: scale masses by 1e4
    val big = (1 to 25).map(k => (f"g$k%02d", k * 10000L)).toDF("src", "t")
    val bigRep = CorpusStats.lorenzReport(big, "src", "t", bins = 5)
      .orderBy("bin").collect()
    val shares = bigRep.map(_.getAs[Long]("share_x1e6")).toSeq
    // 15/325 ≈ 46153·e-6 … 115/325 ≈ 353846·e-6, staging error ≤ ~30%
    // of a millionth per unit (sdiv = floor(3.25e6/1e6)+1 = 4 on 1e4
    // units): tokens 15e4/4 = 37500 — exact expected values:
    assert(shares == Seq(37500L, 100000L, 162500L, 225000L, 287500L),
      s"staged shares: $shares")
    val bigCum = bigRep.map(_.getAs[Long]("cum_share_x1e6")).toSeq
    assert(bigCum == bigCum.sorted && bigCum.last > 790000L &&
      bigCum.last <= 1000000L,
      s"Lorenz curve must rise monotonically toward 1e6: $bigCum")
    val viaOne = CorpusStats.lorenzReport(w.coalesce(1), "src", "t", 5)
      .orderBy("bin").collect().toSeq
    val viaMany = CorpusStats.lorenzReport(w.repartition(13), "src", "t", 5)
      .orderBy("bin").collect().toSeq
    assert(viaOne == viaMany, "Lorenz report must be partition-independent")
  }
}
