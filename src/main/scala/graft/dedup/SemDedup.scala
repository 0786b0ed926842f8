package graft.dedup

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023, arXiv
  * 2303.09540 — public): where q20's lexical near-dup finds byte-similar
  * documents, this finds MEANING-similar ones — k-means-cluster the
  * embedding space, then inside each cluster drop every vector that has a
  * smaller-id neighbor above the cosine threshold (the public SemDeDup
  * keep-lowest-index policy; the lowest id of every duplicate group always
  * survives, and no cross-cluster pair is ever compared — that is the
  * algorithm's contract, not an approximation we add).
  *
  * Scale shape: centroids broadcast (k × dim floats). Assignment is ONE
  * map-side pass over the corpus (broadcast cross join + partial max, the
  * IvfAnn.assign shape) — the corpus shuffles once, on the narrow cell
  * key. The pair stage joins the cluster to itself on `cell` only, so its
  * cost is Σ|cell|² — the paper's own knob: k grows with N so the mean
  * cell size stays constant (k ≈ N/1000 at the 100 TB design point), and
  * the id-ordered drop rule needs NO connected-components iteration (one
  * join, one distinct — compare q37's loop). Dropped ids reduce map-side
  * via distinct before the final flag join.
  *
  * Assignment cost is n·k cosines under this brute-force pass; with
  * k ∝ √n both stages stay sub-quadratic (the bench setting). At the
  * 100 TB point where k must scale linearly with N, replace the flat
  * cross join with a two-level coarse quantizer — assign to √k
  * super-cells first, then to the k centroids within the probed
  * super-cell, exactly the IvfAnn probe shape — without touching the
  * pair stage or the drop policy.
  *
  * Determinism: centroid INIT is the k corpus vectors with the smallest
  * mixed id hash (the IvfAnn.centroids rule — no RNG, no driver state);
  * Lloyd refinement accumulates per-dimension means in DECIMAL(27,9) —
  * exact, associative — then divides and casts back to float (the
  * PqAnn.refineFromSubs rule on full vectors), so the trained centroids,
  * the assignment, and therefore the kept set are BYTE-IDENTICAL across
  * partitionings and core counts (Round6Spec asserts it). Cells that lose
  * every member keep their previous centroid.
  */
object SemDedup {

  /** Deterministic k-means centroids: hash-sample init + `iters` exact-
    * decimal Lloyd refinements. Output: (cid, c_vec).
    */
  def centroids(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    var cents = corpus
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("c_vec"))
      .withColumn("_r", F.hash64(col("cid").cast("string")))
      .orderBy(col("_r")).limit(k).drop("_r")
    for (_ <- 1 to iters) {
      val means = assign(corpus, cents, idCol, vecCol)
        .select(col("cell"), posexplode(col("n_vec")).as(Seq("di", "x")))
        .groupBy(col("cell"), col("di"))
        .agg((sum(col("x").cast(DecimalType(27, 9))) / count(lit(1)))
          .cast("float").as("cx"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("di"), col("cx")))),
          s => s.getField("cx")).as("m_vec"))
      cents = cents
        .join(means, cents("cid") === means("cell"), "left")
        .select(col("cid"), coalesce(col("m_vec"), col("c_vec")).as("c_vec"))
        .localCheckpoint(true) // truncate the per-iteration plan growth
    }
    cents
  }

  /** Nearest-centroid cell per vector: broadcast cross join + map-side
    * partial max over (cos, cid) — deterministic tie-break. Output:
    * (nid, cell, n_vec).
    */
  private def assign(corpus: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val best = corpus
      .select(col(idCol).cast("long").as("nid"), col(vecCol).as("n_vec"))
      .crossJoin(broadcast(cents))
      .groupBy(col("nid"))
      .agg(max(struct(F.cosine(col("n_vec"), col("c_vec")).as("cos"),
        col("cid").as("cid"))).as("m"))
      .select(col("nid"), col("m.cid").as("cell"))
    corpus
      .select(col(idCol).cast("long").as("nid"), col(vecCol).as("n_vec"))
      .join(best, "nid")
  }

  /** Full kept/dropped disposition: (vec_id, cell, is_kept). `x` is
    * dropped iff its cluster holds a smaller-id `y` with
    * cos(x, y) ≥ `eps`. Duplicates that straddle a cluster boundary are
    * never compared — SemDeDup's documented contract (recall is bounded
    * by the clustering, which is why `k` must track N, not row width).
    */
  def dedup(corpus: DataFrame, k: Int, iters: Int, eps: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    dedupWith(corpus, centroids(corpus, k, iters, idCol, vecCol), eps,
      idCol, vecCol)

  /** [[dedup]] against caller-supplied centroids — the entry point for a
    * pre-trained or externally-chosen codebook (and for testing the drop
    * policy in isolation from centroid training).
    */
  def dedupWith(corpus: DataFrame, cents: DataFrame, eps: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, cents, idCol, vecCol)
    val x = assigned.select(col("cell"), col("nid").as("xid"),
      col("n_vec").as("x_vec"))
    val y = assigned.select(col("cell"), col("nid").as("yid"),
      col("n_vec").as("y_vec"))
    val dropped = x.join(y, "cell")
      .where(col("yid") < col("xid") &&
        F.cosine(col("x_vec"), col("y_vec")) >= eps)
      .select(col("xid").as("nid")).distinct()
      .withColumn("_d", lit(true))
    assigned.join(dropped, Seq("nid"), "left")
      .select(col("nid").as("vec_id"), col("cell"),
        not(coalesce(col("_d"), lit(false))).as("is_kept"))
  }
}
