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
}
