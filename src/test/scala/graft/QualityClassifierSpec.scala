package graft

import graft.functions.QualityClassifier
import org.apache.spark.sql.Row

/** Kernel-level coverage for the trained NB quality classifier — q120's
  * oracle proves the full refit-and-replay; these pin the decision
  * function on a hand-computed model (pos = "good good", neg = "bad":
  * cpos(good)=2, cneg(bad)=1, Np=2, Nn=1, V=2, prior = ln(1) = 0) and the
  * smoothing/plan contracts the fixture only reaches in aggregate.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def score(docs: Seq[(Long, String)],
      pos: Seq[String] = Seq("good good"),
      neg: Seq[String] = Seq("bad")): Map[Long, Row] =
    QualityClassifier.nbScore(
      pos.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      neg.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("decision function matches the hand-computed quantized model") {
    val out = score(Seq((1L, "good"), (2L, "bad"), (3L, "good bad")))
    // w(good) = q(ln 3/4) - q(ln 1/3) = 0.810930217
    assert(out(1L).getAs[Long]("logit_x1000") == 810L)
    assert(out(1L).getAs[Boolean]("nb_keep"))
    // w(bad) = q(ln 1/4) - q(ln 2/3) = -0.980829253
    assert(out(2L).getAs[Long]("logit_x1000") == -981L)
    assert(!out(2L).getAs[Boolean]("nb_keep"))
    // sum = -0.169899036 -> floor -170; avg over 2 tokens -> floor -85
    assert(out(3L).getAs[Long]("logit_x1000") == -170L)
    assert(out(3L).getAs[Long]("avg_logodds_x1000") == -85L)
    assert(out(3L).getAs[Long]("n_tokens") == 2L)
  }

  test("unseen tokens contribute the smoothed constant, not a dropped row") {
    val out = score(Seq((1L, "zzz")))
    // w(unseen) = q(ln 1/4) - q(ln 1/3) = -0.287682072
    assert(out(1L).getAs[Long]("logit_x1000") == -288L)
    assert(out(1L).getAs[Long]("n_tokens") == 1L)
  }

  test("class priors shift the logit by the quantized doc-count ratio") {
    // doubling the positive class (same tokens split over two docs)
    // leaves likelihoods unchanged but adds ln(2) = 0.693147181 of prior
    val out = score(Seq((1L, "zzz")), pos = Seq("good", "good"))
    assert(out(1L).getAs[Long]("logit_x1000") == -288L + 693L)
  }

  test("an empty training class fails loudly, never silent NULL logits") {
    // an empty neg class would make the prior ln(inf) and the Decimal
    // cast would NULL every logit; the plan raises instead
    val ex = intercept[Exception] {
      score(Seq((1L, "good")), neg = Seq.empty[String])
    }
    assert(ex.getMessage.contains("non-empty") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-empty")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("model join is broadcast; scoring keeps one wide shuffle") {
    val docs = (1L to 50L).map(i => (i, s"tok$i good")).toDF("doc_id", "text")
    val plan = QualityClassifier.nbScore(
      Seq((0L, "good good")).toDF("doc_id", "text"),
      Seq((0L, "bad")).toDF("doc_id", "text"),
      docs, "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"),
      "corpus token stream must never sort-merge against the model")
  }
}
