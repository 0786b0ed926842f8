package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Operand bound (DECIMAL(38,0) holds |x| < 10^38): the numerator peaks at
  * 4.4e4 · (2N+1) · tf · T, so the computation is exact iff
  * N · tf · T < ~1.1e33 (the denominator's peak, ~2N·(20·tf·T + 18·dl·N),
  * is strictly smaller whenever that holds and dl ≤ T). At the 100 TB
  * design point — N ≈ 1e11 docs, T ≈ 2.5e13 tokens, per-doc term frequency
  * tf ≤ 1e5 — operands peak ≈ 2e34, ~5000× inside the bound. Beyond it,
  * Spark's non-ANSI decimal multiply yields NULL, which `sum()` would
  * silently drop from a posting's score; [[guardedDiv]] therefore treats a
  * null operand as overflow and RAISES instead (the score inputs are
  * counts and sums of counts — never genuinely null).
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
  *
  * Build/search split: repeated query batches must not re-tokenize the
  * corpus, so [[buildIndex]] persists the corpus statistics ONCE — the
  * postings (term, doc_id, tf, dl) partitioned by a term-hash bucket, the
  * per-term document frequencies, and the corpus totals — and
  * [[searchIndex]] scores any later query batch from that layout alone.
  * The probed buckets collect to the driver (bounded: ≤ |query terms|
  * ids) and become an `isin` partition filter, so the scan reads ONLY the
  * bucket directories containing query terms — the IvfAnn.searchIndex
  * partition-pruning protocol applied to text. Both paths share
  * [[scorePostings]], so index-path ≡ in-memory-path is structural, not
  * coincidental (Round6Spec asserts it).
  */
object Bm25 {

  private val D = DecimalType(38, 0)
  private def d(c: org.apache.spark.sql.Column) = c.cast(D)

  private val OverflowMsg =
    "graft.Bm25: DECIMAL(38,0) overflow in score operands - corpus " +
      "exceeds the N*tf*T < ~1.1e33 headroom (see Bm25 scaladoc)"

  /** Overflow-guarded integral ratio: `out = numCol div denCol`, raising
    * if either operand is NULL — which, for Bm25's never-null count
    * arithmetic, can only mean a silent DECIMAL(38,0) overflow upstream.
    */
  private[graft] def guardedDiv(df: DataFrame, numCol: String,
      denCol: String, out: String): DataFrame =
    df.withColumn(out,
      when(col(numCol).isNull.or(col(denCol).isNull),
        raise_error(lit(OverflowMsg)).cast("long"))
        .otherwise(expr(s"$numCol div $denCol")))

  /** (query_id, term) long frame + its distinct term set, both tiny. */
  private def queryFrames(spark: SparkSession,
      queries: Seq[(Long, Seq[String])]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val q = queries.flatMap { case (qid, terms) => terms.map(qid -> _) }
      .toDF("query_id", "term")
    (q, q.select("term").distinct())
  }

  /** Corpus statistics from raw text: per-(doc, term) frequency and
    * per-doc length. One tokenize pass, two narrow-key aggregations.
    */
  private def corpusStats(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(F.tokensLower(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    (tf, dl)
  }

  /** Shared scoring core. `postings` is the PRUNED (term, doc_id, tf, dl)
    * frame (only query terms), `dft` the per-term (term, df) document
    * frequencies, `tot` the one-row (n_docs, n_toks) totals, `q` the
    * (query_id, term) broadcastable query frame.
    */
  private def scorePostings(postings: DataFrame, dft: DataFrame,
      tot: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val scored0 = postings
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(tot))
      .withColumn("_num", d(lit(1000)) * d(lit(2) * col("n_docs") -
        lit(2) * col("df") + lit(1)) * d(lit(44)) * d(col("tf")) *
        d(col("n_toks")))
      .withColumn("_den", d(lit(2) * col("df") + lit(1)) *
        (d(lit(20)) * d(col("tf")) * d(col("n_toks")) +
          d(lit(6)) * d(col("n_toks")) +
          d(lit(18)) * d(col("dl")) * d(col("n_docs"))))
    val scored = guardedDiv(scored0, "_num", "_den", "_sm")
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

  /** Top-`k` docs per query by milli-quantized rational BM25, computed
    * in-memory from raw text (tokenizes the corpus; for repeated query
    * batches use [[buildIndex]] + [[searchIndex]]).
    * Output: (query_id, rnk, doc_id, score_milli).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val (q, qTerms) = queryFrames(docs.sparkSession, queries)
    val (tf, dl) = corpusStats(docs, idCol, textCol)
    val tot = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"))

    // posting-list pruning: only query terms survive to df/scoring
    val pruned = tf.join(broadcast(qTerms), "term")
    val dft = pruned.groupBy("term").agg(count(lit(1)).as("df"))
    scorePostings(pruned.join(dl, "doc_id"), dft, tot, q, k)
  }

  /** Persist the BM25 index: postings (term, doc_id, tf, dl) land
    * `partitionBy(bucket)` where bucket = xxhash64(term) mod `nBuckets`,
    * so a query batch's scan prunes to the bucket directories its terms
    * hash into; per-term df and the corpus totals (which carry
    * `n_buckets`, making the index self-describing) sit next to them.
    * Rebuild when the corpus drifts; the build is the one tokenize pass
    * searches no longer pay.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val (tf0, dl) = corpusStats(docs, idCol, textCol)
    // dl/terms/totals all derive from tf: persisting it makes the
    // postings write the ONE tokenize pass, with the other two writes
    // re-reading the cached frame instead of re-tokenizing the corpus
    val tf = tf0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bucket = pmod(xxhash64(col("term")), lit(nBuckets.toLong))
      tf.join(dl, "doc_id")
        .withColumn("bucket", bucket)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/postings")
      tf.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("bucket", bucket)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/terms")
      dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_toks"),
          lit(nBuckets.toLong).as("n_buckets"))
        .write.mode("overwrite").parquet(s"$path/totals")
    } finally tf.unpersist()
  }

  /** Score a query batch against a persisted index without touching the
    * corpus text. The query terms' bucket ids collect to the driver
    * (bounded: ≤ |query terms| longs) and become `isin` partition filters
    * on both the postings and terms scans — partition pruning skips every
    * bucket no query term hashes into.
    * Output: (query_id, rnk, doc_id, score_milli) — identical to [[topK]]
    * on the same corpus (shared [[scorePostings]]).
    */
  def searchIndex(spark: SparkSession, path: String,
      queries: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val totRow = spark.read.parquet(s"$path/totals").collect()(0)
    val nBuckets = totRow.getAs[Long]("n_buckets")
    val tot = spark.range(1).select(
      lit(totRow.getAs[Long]("n_docs")).as("n_docs"),
      lit(totRow.getAs[Long]("n_toks")).as("n_toks"))

    val (q, qTerms) = queryFrames(spark, queries)
    val buckets = qTerms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq

    val postings = spark.read.parquet(s"$path/postings")
      .where(col("bucket").isin(buckets: _*))
      .join(broadcast(qTerms), "term")
      .select("term", "doc_id", "tf", "dl")
    val dft = spark.read.parquet(s"$path/terms")
      .where(col("bucket").isin(buckets: _*))
      .join(broadcast(qTerms), "term")
      .select("term", "df")
    scorePostings(postings, dft, tot, q, k)
  }
}
