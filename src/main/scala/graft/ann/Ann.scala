package graft.ann

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  * Baseline: brute-force cosine top-k with the query set broadcast (the
  * corpus scan stays fully distributed; result size is bounded at q×k).
  * Scale path: banded random-hyperplane LSH restricts each query to the
  * union of its bucket neighborhoods across `tables` independent codes,
  * cutting the scanned corpus by ~2^planes per table while the OR across
  * tables keeps recall high.
  */
object BruteForce {

  /** Exact cosine top-k: broadcast the (small) query set against the corpus,
    * rank per query with a deterministic tie-break on the neighbor id.
    * Output: qid, nid, rnk — rank-only, so results are stable across engines
    * and float-summation orders.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("qid"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("n_vec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    c.crossJoin(q)
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }
}

object LshAnn {

  /** Banded-LSH ANN: queries and corpus are coded with the same `tables` ×
    * `planes` deterministic hyperplane scheme; a corpus vector is a
    * candidate for a query iff they share ANY table's code. The broadcast
    * query side keeps the corpus scan shuffle-free; candidate dedup
    * aggregates narrow (qid, nid, cos) rows before the per-query ranking.
    * Recall < 1.0 by construction; `tables` amplifies it toward 1.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      tables: Int = 16, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def coded(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        posexplode(F.hyperplaneCodes(col(vecCol), planes, tables))
          .as(Seq("table", "code")))
    val q = broadcast(coded(queries, "qid", "q_vec"))
    val c = coded(corpus, "nid", "n_vec")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    c.join(q, Seq("table", "code"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
      .groupBy(col("qid"), col("nid"))
      .agg(max(col("cos")).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  /** Per-query recall of an approximate top-k against the exact top-k:
    * |approx ∩ exact| * 100 / k. Both inputs are (qid, nid, rnk) frames as
    * produced by [[topK]] / [[BruteForce.topK]]. The exact side drives the
    * count so queries the approximate side missed entirely still report 0.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame =
    exact.select("qid", "nid")
      .join(approx.select(col("qid"), col("nid"), lit(1L).as("hit")),
        Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg((sum(coalesce(col("hit"), lit(0L))) * 100 / k).cast("long")
        .as("recall_pct"))
}

/** IVF (inverted-file) ANN — the other classical scale path besides LSH:
  * partition the corpus into `nCentroids` Voronoi cells, search only the
  * `nProbe` cells nearest each query. Centroids are a DETERMINISTIC
  * hash-sample of the corpus itself (the k vectors with the smallest
  * mixed id hash) — no iterative k-means state on the driver, no RNG.
  *
  * Scale shape: centroids broadcast (k × dim floats); cell assignment is
  * one map-side pass + a narrow (id, cell) shuffle; the probe join keys
  * corpus cells against a broadcast (query × probe-cell) set, so the
  * corpus never reshuffles per query. Search cost drops by
  * ~nCentroids/nProbe vs brute force.
  */
object IvfAnn {

  /** Deterministic centroid sample: the nCentroids corpus vectors with the
    * smallest mixed id hash.
    */
  def centroids(corpus: DataFrame, nCentroids: Int, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("cid"), col(vecCol).as("c_vec"))
      .withColumn("_r", F.hash64(col("cid").cast("string")))
      .orderBy(col("_r")).limit(nCentroids).drop("_r")

  /** Nearest-centroid cell per corpus vector — map-side partial
    * max(struct), only narrow (nid, cell) rows shuffle.
    */
  private[ann] def assign(corpus: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val assigned = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(cents))
      .groupBy(col("nid"))
      .agg(max(struct(F.cosine(col("n_vec"), col("c_vec")).as("cos"),
        col("cid").as("cid"))).as("m"))
      .select(col("nid"), col("m.cid").as("cell"))
    corpus
      .select(col(idCol).as("nid"), col(vecCol).as("n_vec"))
      .join(assigned, "nid")
  }

  /** nProbe nearest cells per query — the query set is small by contract,
    * result broadcast.
    */
  private[ann] def probes(queries: DataFrame, cents: DataFrame, nProbe: Int,
      idCol: String, vecCol: String): DataFrame = {
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("p_cos").desc, col("cell"))
    queries.select(col(idCol).as("qid"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("q_vec"), col("cid").as("cell"),
        F.cosine(col("q_vec"), col("c_vec")).as("p_cos"))
      .withColumn("_pr", row_number().over(wProbe))
      .where(col("_pr") <= nProbe)
      .select(col("qid"), col("q_vec"), col("cell"))
  }

  private def rankWithin(candidates: DataFrame, k: Int): DataFrame = {
    val wRank = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    candidates
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }

  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 64, nProbe: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = centroids(corpus, nCentroids, idCol, vecCol)
    rankWithin(
      assign(corpus, cents, idCol, vecCol)
        .join(broadcast(probes(queries, cents, nProbe, idCol, vecCol)),
          Seq("cell")),
      k)
  }

  /** Persist the IVF index: the assigned corpus lands `partitionBy(cell)`,
    * so the on-disk layout is ALIGNED with the probe pattern — a search
    * touching nProbe cells scans nProbe directories and Spark's partition
    * pruning skips the rest of the corpus entirely. Centroids (k×dim,
    * tiny) sit next to the index. Rebuild when the corpus drifts; the
    * build is one assignment pass.
    */
  def buildIndex(corpus: DataFrame, path: String, nCentroids: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = centroids(corpus, nCentroids, idCol, vecCol)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    assign(corpus, cents, idCol, vecCol)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Drift audit over a persisted index — the rebuild-when gauge for
    * the vector side (the [[graft.dedup.MinHashDedup.indexManifest]]
    * posture applied to ANN): assign the CURRENT corpus to the
    * centroids frozen at build time and report, per cell, how many
    * vectors still land there and how well they fit (mean member→
    * centroid cosine). A corpus that drifted since the build shows
    * falling means and emptying cells; `is_stale` trips below
    * `staleBelowX1e9` (cosine × 10⁹) or on an emptied cell.
    *
    * Determinism: per-vector cosines quantize to DECIMAL(18,9) ×10⁹
    * BIGINT BEFORE the sum (merge-order-independent — the Perplexity
    * NLL trick) and the mean is the exact floor division. Scale shape:
    * centroids broadcast, one map-side assignment pass, one narrow
    * (cell, cos9) shuffle. Output: (cell, n_members, mean_cos_x1e9,
    * is_stale) for EVERY build-time cell.
    */
  def driftAudit(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding",
      staleBelowX1e9: Long = 700000000L): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val assigned = corpus
      .select(col(idCol).as("nid"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(cents))
      .groupBy(col("nid"))
      .agg(max(struct(F.cosine(col("n_vec"), col("c_vec")).as("cos"),
        col("cid").as("cid"))).as("m"))
      .select(col("m.cid").as("cell"),
        (col("m.cos").cast(org.apache.spark.sql.types.DecimalType(18, 9))
          * 1000000000L).cast("long").as("cos9"))
    val perCell = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("cos9")).as("sum9"))
    cents.select(col("cid").as("cell"))
      .join(perCell, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        when(col("n_members").isNull, lit(null).cast("long"))
          .otherwise(VectorPrep.floorDiv(col("sum9"), col("n_members")))
          .as("mean_cos_x1e9"))
      .withColumn("is_stale", col("mean_cos_x1e9").isNull ||
        col("mean_cos_x1e9") < staleBelowX1e9)
  }

  /** Search a persisted index. The probe cells collect to the driver
    * (bounded: |queries| × nProbe ids) and become an `isin` partition
    * filter — the scan reads ONLY the probed cell directories.
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int, nProbe: Int = 8, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val pr = probes(queries, cents, nProbe, idCol, vecCol)
    val cells = pr.select("cell").distinct().collect().map(_.getLong(0))
    val idx = spark.read.parquet(s"$path/index")
      .where(col("cell").isin(cells.toIndexedSeq: _*))
    rankWithin(idx.join(broadcast(pr), Seq("cell")), k)
  }
}

/** Product quantization ANN (Jégou/Douze/Schmid 2011, public): vectors are
  * chopped into `m` subspaces, each subvector quantized to one of `ksub`
  * per-subspace centroids, so a d-dim float vector compresses to m small
  * codes (here 64 floats → 8 bytes at m=8/ksub=16 — a 32× memory cut).
  * Search runs Asymmetric Distance Computation: each query precomputes its
  * distance to every centroid of every subspace (m × ksub doubles), and a
  * corpus vector's approximate squared-L2 is the SUM of m table lookups —
  * no float-vector math touches the corpus at query time.
  *
  * Codebooks are a DETERMINISTIC per-subspace hash-sample of the corpus's
  * own subvectors (the same no-RNG/no-driver-state centroid rule IvfAnn
  * uses; a Lloyd refinement would need fp-order-stable means to keep the
  * engine's byte-identical-across-partitionings guarantee, so graft trades
  * a few recall points for exact reproducibility and documents it).
  *
  * Scale shape: codebook build ranks a NARROW (id, sub, hash) frame (the
  * vectors join back only for the m × ksub winners); encode joins the
  * broadcast codebook and reduces map-side to one code per (vector,
  * subspace); search joins corpus codes against a BROADCAST per-query
  * distance table on (sub, code) — the corpus never reshuffles per query.
  * ADC partial distances are quantized to DECIMAL(18,9) before the sum so
  * ranking is merge-order-independent (the Perplexity NLL trick).
  *
  * The corpus vectors here are unit-norm, so squared L2 = 2 - 2·cosine and
  * PQ's L2 ranking is directly comparable to the cosine exact baseline.
  */
object PqAnn {

  /** Exploded (id, sub, n_sub) subvector frame — built ONCE per search and
    * persisted; codebook build, every Lloyd iteration, and encode all read
    * it (recomputing the explode+slice per pass dominated the PQ runtime).
    */
  private def subvectors(df: DataFrame, m: Int, subDim: Int, idOut: String,
      idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as(idOut), col(vecCol).as("_v"))
      .select(col(idOut),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("_v"))
      .withColumn("n_sub",
        slice(col("_v"), col("sub") * subDim + 1, lit(subDim)))
      .select(idOut, "sub", "n_sub")

  /** Initial codebook from the subvector frame: per subspace, the ksub
    * donors with the smallest (id, sub)-mixed hash. The rank runs on a
    * NARROW (id, sub, hash) projection; subvectors join back for the
    * m x ksub winners only.
    */
  private def codebookFromSubs(subs: DataFrame, ksub: Int): DataFrame = {
    val w = Window.partitionBy(col("sub")).orderBy(col("_r"), col("nid"))
    val winners = subs.select(col("nid"), col("sub"))
      .withColumn("_r", F.murmur64(col("nid").cast("long") * 31 + col("sub")))
      .withColumn("code", (row_number().over(w) - 1).cast("int"))
      .where(col("code") < ksub)
      .select("nid", "sub", "code")
    winners.join(subs, Seq("nid", "sub"))
      .select(col("sub"), col("code"), col("n_sub").as("c_sub"))
  }

  /** Nearest-centroid assignment: deterministic (dist, code) tie-break,
    * map-side partial min_by.
    */
  private def assign(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), "sub")
      .groupBy(col("nid"), col("sub"))
      .agg(min_by(col("code"),
        struct(F.l2sq(col("n_sub"), col("c_sub")).as("d"),
          col("code").as("c"))).as("code"))

  /** Deterministic Lloyd refinement: assign every subvector to its nearest
    * centroid, recompute centroids as per-dimension means, repeat. Means
    * accumulate in DECIMAL(27,9) — exact and associative — then divide and
    * cast back to float, so the refined codebook is BYTE-IDENTICAL across
    * partitionings/core counts (a plain double mean is merge-order-
    * dependent, which would break the engine's reproducibility guarantee).
    * Codes that lose all members keep their previous centroid.
    */
  private def refineFromSubs(subs: DataFrame, cb0: DataFrame,
      iters: Int): DataFrame = {
    var cb = cb0
    for (_ <- 1 to iters) {
      val means = subs.join(assign(subs, cb), Seq("nid", "sub"))
        .select(col("sub"), col("code"),
          posexplode(col("n_sub")).as(Seq("di", "x")))
        .groupBy(col("sub"), col("code"), col("di"))
        .agg((sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 9)))
          / count(lit(1))).cast("float").as("cx"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("di"), col("cx")))),
          s => s.getField("cx")).as("new_sub"))
      cb = cb.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"),
          coalesce(col("new_sub"), col("c_sub")).as("c_sub"))
        .localCheckpoint(true) // truncate the per-iteration plan growth
    }
    cb
  }

  /** Public codebook surface (unpersisted one-shot build). */
  def codebook(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    codebookFromSubs(subvectors(corpus, m, dim / m, "nid", idCol, vecCol), ksub)
  }

  /** PQ codes per corpus vector: (nid, sub, code). */
  def encode(corpus: DataFrame, cb: DataFrame, m: Int, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    assign(subvectors(corpus, m, dim / m, "nid", idCol, vecCol), cb)

  /** ADC top-k: corpus codes ⋈ broadcast per-query centroid-distance table
    * on (sub, code); approximate distance = exact decimal sum of the m
    * partial squared-L2s; rank ascending with nid tie-break. With
    * `rerank` > 0, the compressed scan only SHORTLISTS (top `rerank` per
    * query) and true vectors join back for the shortlist rows alone —
    * |q| × rerank of them — the standard ADC + exact re-rank that buys
    * back quantization-error recall for one narrow id-keyed join.
    */
  /** Train the PQ index: (codebook, codes), both eagerly materialized via
    * localCheckpoint so repeated searches reuse them without replanning,
    * and the wide exploded subvector frame is RELEASED before returning —
    * without that every build leaked a persisted corpus-sized frame into
    * the block manager (measured as a whole-bench slowdown). Like
    * [[IvfAnn.buildIndex]] and [[graft.functions.Bpe.train]], training is
    * the one-time step; [[search]] is the per-query-batch step.
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16, dim: Int = 64,
      lloydIters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val subs = subvectors(corpus, m, dim / m, "nid", idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb0 = codebookFromSubs(subs, ksub)
    val cbLazy = if (lloydIters > 0) refineFromSubs(subs, cb0, lloydIters) else cb0
    val cb = cbLazy.localCheckpoint(true)
    val codes = assign(subs, cb).localCheckpoint(true)
    subs.unpersist(false)
    (cb, codes)
  }

  /** ADC search over a trained index. `corpus` is only touched when
    * `rerank` > 0 (true vectors join back for the shortlist rows).
    */
  def search(cb: DataFrame, codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, m: Int = 8, dim: Int = 64,
      rerank: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val subDim = dim / m
    val qd = subvectors(queries, m, subDim, "qid", idCol, vecCol)
      .join(broadcast(cb), "sub")
      .select(col("qid"), col("sub"), col("code"),
        F.l2sq(col("n_sub"), col("c_sub"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("d"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    val adc = codes.join(broadcast(qd), Seq("sub", "code"))
      .groupBy(col("qid"), col("nid"))
      .agg(sum(col("d")).as("dist"))
      .where(col("qid") =!= col("nid"))
      .withColumn("rnk", row_number().over(w).cast("long"))
    if (rerank <= 0) adc.where(col("rnk") <= k).select("qid", "nid", "rnk")
    else {
      val short = adc.where(col("rnk") <= math.max(rerank, k))
        .select("qid", "nid")
      val qv = broadcast(queries
        .select(col(idCol).as("qid"), col(vecCol).as("q_vec")))
      val wx = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      short
        .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("n_vec")),
          "nid")
        .join(qv, "qid")
        .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
        .withColumn("rnk", row_number().over(wx).cast("long"))
        .where(col("rnk") <= k)
        .select("qid", "nid", "rnk")
    }
  }

  /** One-shot convenience: train + search. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, dim: Int = 64, lloydIters: Int = 2, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cb, codes) = train(corpus, m, ksub, dim, lloydIters, idCol, vecCol)
    search(cb, codes, corpus, queries, k, m, dim, rerank, idCol, vecCol)
  }
}

/** IVF + SQ8 — the composed production index (the "IVF-SQ" layout of
  * public ANN libraries): the corpus partitions into Voronoi cells
  * (IvfAnn's deterministic hash-sampled centroids) AND each vector is
  * stored as int8 SQ8 codes (VectorPrep's exact quantization), so a
  * search touches only nProbe cell directories (partition pruning) and
  * reads 4×-smaller rows inside them — the two classical scale levers
  * stacked. Scoring inside the probed cells is the integer ADC of
  * [[VectorPrep.sq8TopK]]; the top-`rerank` shortlist re-ranks with
  * true-vector cosine.
  *
  * Scale shape: build is one assignment pass + one encode pass, landed
  * `partitionBy(cell)`; search collects |queries|·nProbe cell ids
  * (bounded) into a partition filter, broadcasts the milli-unit query
  * table, and never shuffles the index.
  */
object IvfSqAnn {

  /** Persist the composed index: SQ8 rows partitioned by IVF cell,
    * centroids beside (the [[IvfAnn.buildIndex]] layout with encoded
    * payloads).
    */
  def buildIndex(corpus: DataFrame, path: String, nCentroids: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = IvfAnn.centroids(corpus, nCentroids, idCol, vecCol)
    cents.write.mode("overwrite").parquet(s"$path/centroids")
    val cells = IvfAnn.assign(corpus, cents, idCol, vecCol)
      .select("nid", "cell")
    VectorPrep.sq8Encode(corpus, idCol, vecCol)
      .join(cells, "nid")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Absorb new vectors into a persisted [[buildIndex]] index — the
    * daily-append step closing the ANN lifecycle (the
    * [[graft.dedup.MinHashDedup.absorbIndex]] posture applied to
    * vectors): assign the batch to the FROZEN build-time centroids
    * (broadcast, map-side), SQ8-encode, and APPEND into the existing
    * `partitionBy(cell)` layout. Existing cell directories gain one
    * file set; untouched cells are never rewritten and the index side
    * never exchanges — at 100 TB a day's batch costs one batch-sized
    * pass, not an index rewrite. Frozen centroids keep probe pruning
    * valid for every absorbed row; [[IvfAnn.driftAudit]] is the gauge
    * that says when freezing stopped being a good idea, and
    * [[maintainIndex]] the rebuild that answers it. The caller absorbs
    * each id at most once (the index is a set keyed by nid — the
    * absorbIndex contract).
    */
  def absorbVectors(spark: org.apache.spark.sql.SparkSession, path: String,
      newVectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
    val cells = IvfAnn.assign(newVectors, cents, idCol, vecCol)
      .select("nid", "cell")
    VectorPrep.sq8Encode(newVectors, idCol, vecCol)
      .join(cells, "nid")
      .write.mode("append").partitionBy("cell").parquet(s"$path/index")
  }

  /** Audit-then-rebuild maintenance — the q149 gauge→compaction loop
    * applied to the vector index: run [[IvfAnn.driftAudit]] of the
    * CURRENT corpus against the frozen centroids; if any cell is stale
    * (emptied, or mean member→centroid cosine below the floor), retrain
    * centroids from the current corpus and rebuild the index in place.
    * Returns whether the rebuild fired. Idempotent: a healthy index is
    * never touched, and a rebuilt index re-audits healthy (the spec
    * pins both). Absorb daily, maintain on the audit's cadence.
    */
  def maintainIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, nCentroids: Int = 64,
      staleBelowX1e9: Long = 700000000L, idCol: String = "vec_id",
      vecCol: String = "embedding"): Boolean = {
    val stale = !IvfAnn.driftAudit(spark, path, corpus, idCol, vecCol,
      staleBelowX1e9).where(col("is_stale")).isEmpty
    if (stale) buildIndex(corpus, path, nCentroids, idCol, vecCol)
    stale
  }

  /** Search the persisted composed index. `corpus` is touched only for
    * the exact re-rank of the |queries|·rerank shortlist (rerank = 0
    * returns the raw integer-ADC ranking). Output: (qid, nid, rnk).
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      corpus: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 8,
      rerank: Int = 0, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val pr = IvfAnn.probes(queries, cents, nProbe, idCol, vecCol)
    val cells = pr.select("cell").distinct().collect().map(_.getLong(0))
    val idx = spark.read.parquet(s"$path/index")
      .where(col("cell").isin(cells.toIndexedSeq: _*))
    val qm = broadcast(queries.select(col(idCol).as("qid"),
      transform(col(vecCol), v => floor(v.cast("double") * 1000)
        .cast("long")).as("q_m"),
      col(vecCol).as("q_vec")))
    val prq = broadcast(pr.select("qid", "cell")
      .join(qm.select("qid", "q_m"), "qid"))
    val dot = aggregate(
      zip_with(col("codes"), col("q_m"), (c, q) => c * q),
      lit(0L), (a, x) => a + x)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid"))
    val short = idx.join(prq, Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .withColumn("score",
        VectorPrep.floorDiv(dot * col("max_abs_q") * 10000L,
          greatest(col("norm_x1e3"), lit(1L))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= math.max(rerank, k))
    if (rerank <= 0) short.select("qid", "nid", "rnk")
    else {
      val wx = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("nid"))
      short.select("qid", "nid")
        .join(corpus.select(col(idCol).as("nid"),
          col(vecCol).as("n_vec")), "nid")
        .join(qm.select("qid", "q_vec"), "qid")
        .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
        .withColumn("rnk", row_number().over(wx).cast("long"))
        .where(col("rnk") <= k)
        .select("qid", "nid", "rnk")
    }
  }
}

/** Johnson-Lindenstrauss random-sign projection ANN — the cheapest of
  * the classical scale levers (alongside IVF's pruning and SQ8's row
  * shrink): project every embedding into `dims` exact-integer
  * components via a hash-DEFINED ±1 matrix (nothing trained, stored,
  * or broadcast — [[graft.functions.Hashing.jlProject]]), shortlist by
  * integer projected dot product, then exact-cosine re-rank of the
  * shortlist only.
  *
  * Scale shape: the projection is one map-side pass; the shortlist
  * crossJoin against the broadcast query set touches `dims` longs per
  * corpus row instead of the full float vector (64-dim floats → 16
  * longs is the same 4× row shrink as SQ8, with an integer dot that
  * needs dims multiplies instead of D float ops); only the
  * `shortlist` survivors per query ever load full vectors for the
  * re-rank. Projections are exact integers on milli-quantized
  * components, so ranking ties break identically on every engine and
  * partitioning — and the DuckDB oracle replays the whole search.
  */
object JlAnn {

  /** Approximate top-k: (qid, nid, rnk) — the [[BruteForce.topK]]
    * output shape, recall < 1 by construction ([[LshAnn.recallAtK]]
    * audits it against the exact ranking).
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, dims: Int = 16,
      shortlist: Int = 50, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def milli(vec: org.apache.spark.sql.Column) =
      transform(vec, v => floor(v.cast("double") * 1000).cast("long"))
    val q = broadcast(queries.select(col(idCol).as("qid"),
      col(vecCol).as("q_vec"),
      F.jlProject(milli(col(vecCol)), dims).as("q_p")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("n_vec"),
      F.jlProject(milli(col(vecCol)), dims).as("n_p"))
    val wS = Window.partitionBy(col("qid"))
      .orderBy(col("pdot").desc, col("nid"))
    val short = c.crossJoin(q)
      .where(col("qid") =!= col("nid"))
      .withColumn("pdot",
        aggregate(zip_with(col("q_p"), col("n_p"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("srnk", row_number().over(wS))
      .where(col("srnk") <= shortlist)
    val wC = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    short.withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(wC).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }
}
