package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained model-based quality classification — the reference-vs-crawl
  * gate of the public GPT-3 / LLaMA / CCNet pipelines (Brown et al. 2020
  * §A; Touvron et al. 2023; Wenzek et al. 2020): fit a classifier that
  * separates a curated reference corpus from random crawl text, then
  * score EVERY document by how reference-like it looks. The public
  * deployments use fastText-style linear models; the engine form here is
  * multinomial Naive Bayes with add-one smoothing — the classic
  * closed-form member of the same bag-of-tokens family, chosen because
  * its training is ONE distributed counting pass (no iterative descent)
  * and its scores replay exactly in external SQL.
  *
  * Decision function, per document d with tokens t:
  *
  *   logit(d) = ln(Dp/Dn) + Σ_t [ ln((cp(t)+1)/(Np+V)) −
  *                                ln((cn(t)+1)/(Nn+V)) ]
  *
  * with cp/cn the class token counts, Np/Nn the class token totals, V the
  * union train vocabulary, Dp/Dn the class doc counts (the prior). Tokens
  * unseen in training still contribute the smoothed ln((Nn+V)/(Np+V)) —
  * the LEFT-join + coalesce path, not a dropped row. logit ≥ 0 is the MAP
  * keep decision; the length-normalized mean log-odds is emitted alongside
  * for threshold-style use (fastText's score analog).
  *
  * Determinism: each per-token class log-likelihood quantizes to
  * DECIMAL(18,9) BEFORE the subtraction and the document sum (the
  * q58/q114 discipline) — document scores are exact decimals, independent
  * of partitioning and merge order, and an external engine refitting the
  * same counts reproduces them bit-for-bit.
  *
  * Scale shape: training is one shuffle (token → class-count groupBy);
  * the model is a (term, cpos, cneg) frame that Heaps' law keeps
  * sublinear in the train corpus, BROADCAST so the corpus-side token
  * stream joins map-side (Zipf-hot terms never shuffle); totals and the
  * prior ride one-row crossJoins. The only wide shuffle over the scored
  * corpus is the per-document sum. A reference corpus is curated and
  * bounded by construction (CCNet trains on Wikipedia), so the broadcast
  * is safe at any crawl scale — the crawl side only ever streams.
  * `broadcastModel = false` is the q58-pattern escape hatch for a
  * pathological train vocabulary (the 100× probe's marker-inflated
  * corpus grows V linearly — 31 → 2.05M distinct terms — and the
  * broadcast hash build dominated the last decade): the token⋈model
  * join then shuffles on `term` and Zipf-hot keys ride AQE's skew
  * split.
  */
object QualityClassifier {

  private val Dec = DecimalType(18, 9)

  /** Train on `pos` (reference) vs `neg` (crawl) and score `docs`.
    * Output: doc_id, n_tokens, logit_x1000 (floor of 1000·logit),
    * avg_logodds_x1000 (length-normalized, prior excluded), nb_keep.
    * Documents whose text is NULL carry no token array and drop out
    * (same posture as the q114 bigram scorer).
    */
  def nbScore(pos: DataFrame, neg: DataFrame, docs: DataFrame,
      idCol: String, textCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    def toks(df: DataFrame): DataFrame =
      df.select(explode(F.tokensLower(col(textCol))).as("term"))

    val train = toks(pos).withColumn("y", lit(1L))
      .unionByName(toks(neg).withColumn("y", lit(0L)))
    val counts = train.groupBy(col("term"))
      .agg(sum(col("y")).as("cpos"), sum(lit(1L) - col("y")).as("cneg"))
    val tokTotals = counts.agg(
      sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"),
      count(lit(1)).as("v"))
    val docTotals = pos.agg(count(lit(1)).as("nposd"))
      .crossJoin(neg.agg(count(lit(1)).as("nnegd")))
    // An empty training class makes the prior ±Infinity, which the
    // Decimal cast silently turns into NULL logits for EVERY scored
    // document (ADVICE r12) — fail in the plan instead. The guard lives
    // inside prior_q itself (not a droppable assert column) so column
    // pruning can never optimize it away.
    val totals = tokTotals.crossJoin(docTotals)
      .withColumn("prior_q",
        when(col("nposd") > 0 && col("nnegd") > 0,
          log(col("nposd").cast("double") / col("nnegd").cast("double"))
            .cast(Dec))
        .otherwise(raise_error(concat(
          lit("QualityClassifier: both training classes must be non-empty"),
          lit(" (pos docs="), col("nposd").cast("string"),
          lit(", neg docs="), col("nnegd").cast("string"), lit(")")))))

    val corpus = docs.select(col(idCol).as("doc_id"),
      explode(F.tokensLower(col(textCol))).as("term"))
    corpus
      .join(if (broadcastModel) broadcast(counts) else counts,
        Seq("term"), "left")
      .crossJoin(totals) // one-row model totals + prior
      .withColumn("w",
        log((coalesce(col("cpos"), lit(0L)) + 1).cast("double") /
          (col("npos") + col("v")).cast("double")).cast(Dec)
        - log((coalesce(col("cneg"), lit(0L)) + 1).cast("double") /
          (col("nneg") + col("v")).cast("double")).cast(Dec))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w")).as("sum_w"),
        first(col("prior_q")).as("prior_q"))
      .withColumn("logit_x1000",
        floor((col("prior_q") + col("sum_w")) * 1000).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("logit_x1000"),
        floor(col("sum_w") * 1000 / col("n_tokens")).cast("long")
          .as("avg_logodds_x1000"),
        (col("logit_x1000") >= 0L).as("nb_keep"))
  }
}
