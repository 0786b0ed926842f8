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
  private def assign(corpus: DataFrame, cents: DataFrame, idCol: String,
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
  private def probes(queries: DataFrame, cents: DataFrame, nProbe: Int,
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
