package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic BM25 batch retrieval over the corpus.
  *
  * Spec: the reference's consumers query the aggregated warehouse by
  * category/unit name (aggregates_python.py:41-96 produces the tables the
  * BI layer searches); a training-data pipeline needs the same "find the
  * documents matching this query" primitive corpus-side, which is BM25 over
  * the q66 inverted-index layout.
  *
  * Scoring is Okapi BM25 (k1 = 1.2, b = 3/4) with ONE deliberate
  * substitution: the Robertson idf keeps its rational core
  * (N - df + 0.5)/(df + 0.5) but drops the outer log. The log is strictly
  * monotone, so per-TERM posting order is unchanged, and dropping it makes
  * every per-posting score a ratio of two exact integers — the quantized
  * score (and therefore the ranking) is then bit-identical in any engine
  * with 128-bit integer arithmetic (Spark DECIMAL(38,0) here, HUGEINT in
  * the DuckDB oracle). A double `ln()` is ulp-unstable across engines —
  * the q36 rational-scoring lesson applied to retrieval.
  *
  * With k1 = 6/5, b = 3/4, avgdl = T/N (T = corpus tokens, N = docs), the
  * per-posting score idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))
  * integer-clears to
  *
  *   score_milli = floor( 1000 · (2N − 2df + 1) · 44 · tf · T
  *                        / ((2df + 1) · (20·tf·T + 6·T + 18·dl·N)) )
  *
  * Scale shape: the query set is tiny and BROADCASTS; the (doc, term) tf
  * frame is semi-joined down to query terms BEFORE df/scoring (posting-list
  * pruning), so every downstream shuffle carries only matching postings.
  * One corpus tf aggregation + one doc-length aggregation (both shuffle
  * narrow (id, term) keys), a broadcast df/totals join, one
  * (query_id, doc_id) partial-aggregated sum, and a per-query top-k window
  * that Spark executes as WindowGroupLimit (rank pushdown). No driver-side
  * vocabulary, no all-pairs, no posting list ever leaves its term partition
  * un-pruned.
  */
object Bm25 {

  private val D = DecimalType(38, 0)
  private def d(c: org.apache.spark.sql.Column) = c.cast(D)

  /** Top-`k` docs per query by milli-quantized rational BM25.
    * Output: (query_id, rnk, doc_id, score_milli).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, terms) => terms.map(qid -> _) }
      .toDF("query_id", "term")
    val qTerms = q.select("term").distinct()

    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(F.tokensLower(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))

    // posting-list pruning: only query terms survive to df/scoring
    val pruned = tf.join(broadcast(qTerms), "term")
    val dft = pruned.groupBy("term").agg(count(lit(1)).as("df"))

    val scored = pruned
      .join(broadcast(dft), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("_num", d(lit(1000)) * d(lit(2) * col("n_docs") -
        lit(2) * col("df") + lit(1)) * d(lit(44)) * d(col("tf")) *
        d(col("n_toks")))
      .withColumn("_den", d(lit(2) * col("df") + lit(1)) *
        (d(lit(20)) * d(col("tf")) * d(col("n_toks")) +
          d(lit(6)) * d(col("n_toks")) +
          d(lit(18)) * d(col("dl")) * d(col("n_docs"))))
      .withColumn("_sm", expr("_num div _den"))
      .join(broadcast(q), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum("_sm").cast("long").as("score_milli"))

    val w = Window.partitionBy("query_id")
      .orderBy(col("score_milli").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("query_id", "rnk", "doc_id", "score_milli")
  }
}
