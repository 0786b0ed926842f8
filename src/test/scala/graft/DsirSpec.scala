package graft

import graft.functions.{Dsir, F}
import org.apache.spark.sql.functions._

/** DSIR selection (q126) — the oracle proves the full replay at corpus
  * scale; these pin the kernel contract, the discrimination direction,
  * the unseen-bucket posture, and the exact selection-count arithmetic
  * on hand-built corpora.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("dsirBuckets: n unigrams + n-1 bigrams, all masked into [0, B)") {
    val out = spark.range(1)
      .select(F.dsirBuckets(F.tokensLower(lit("a b c d")), 64).as("b"))
      .as[Seq[Int]].head()
    assert(out.length == 7, "4 tokens must give 4 unigram + 3 bigram feats")
    assert(out.forall(b => b >= 0 && b < 64))
    // same tokens, same buckets — and the bigram features are
    // order-sensitive where a bag of unigrams is not
    val ab = spark.range(1)
      .select(F.dsirBuckets(F.tokensLower(lit("a b")), 64).as("b"))
      .as[Seq[Int]].head()
    val ba = spark.range(1)
      .select(F.dsirBuckets(F.tokensLower(lit("b a")), 64).as("b"))
      .as[Seq[Int]].head()
    assert(ab.take(2).sorted == ba.take(2).sorted, "unigram bag must match")
    assert(ab(2) != ba(2), "bigram bucket must be order-sensitive")
  }

  test("dsirBuckets rejects a non-power-of-two bucket count") {
    val ex = intercept[Exception] {
      spark.range(1)
        .select(F.dsirBuckets(F.tokensLower(lit("a b")), 100).as("b"))
        .collect()
    }
    assert(ex.getMessage.contains("power of two"))
  }

  test("importance scores separate target-like from raw-like docs") {
    val target = Seq((1L, "alpha beta gamma alpha beta"),
      (2L, "beta gamma alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq((3L, "zig zag zog zig zag"),
      (4L, "zag zog zig zag zog")).toDF("doc_id", "text")
    val docs = Seq((10L, "alpha beta gamma"), (11L, "zig zag zog"),
      (12L, "alpha beta zig zag"), (13L, "unseen words entirely"))
      .toDF("doc_id", "text")
    val r = Dsir.select(target, raw, docs, "doc_id", "text",
      buckets = 1024, selectPerMille = 500)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getLong(0) ->
      (x.getLong(3), x.getLong(4), x.getBoolean(5))).toMap
    // target-vocabulary doc scores highest, raw-vocabulary lowest,
    // the mixed doc in between
    assert(byId(10L)._1 > byId(12L)._1 && byId(12L)._1 > byId(11L)._1,
      s"score order wrong: $byId")
    assert(byId(10L)._2 == 1L, "target-like doc must rank first")
    // exactly floor(4 * 500/1000) = 2 selected
    assert(r.count(_.getBoolean(5)) == 2)
    assert(byId(10L)._3 && !byId(11L)._3)
    // the all-unseen doc still scores (w0 path): 3 uni + 2 bi feats
    assert(byId(13L) != null && r.find(_.getLong(0) == 13L).get
      .getLong(1) == 5L)
  }

  test("selection count is exact over score ties (doc_id breaks them)") {
    val same = (1L to 10L).map(i => (i, "same text every time"))
      .toDF("doc_id", "text")
    val r = Dsir.select(same.limit(2), same, same, "doc_id", "text",
      selectPerMille = 300).collect()
    // identical docs ⇒ identical scores; rank is by doc_id and exactly
    // floor(10*0.3) = 3 are selected — the 3 smallest ids
    assert(r.count(_.getBoolean(5)) == 3)
    assert(r.filter(_.getBoolean(5)).map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }
}
