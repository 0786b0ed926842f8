package graft.ann

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  * Baseline: brute-force cosine top-k with the query set broadcast (the
  * corpus scan stays fully distributed; result size is bounded at q×k).
  * Scale path: random-hyperplane LSH restricts each query to its bucket
  * neighborhood, cutting the scanned corpus by ~2^planes.
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

  /** LSH-bucketed ANN: queries and corpus are bucketed by the same
    * deterministic hyperplane code; each query ranks only its own bucket.
    * Recall < 1.0 by construction; `planes` tunes bucket granularity.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("qid"), col(vecCol).as("q_vec"),
      F.hyperplaneBucket(col(vecCol), planes).as("bucket")))
    val c = corpus.select(
      col(idCol).as("nid"), col(vecCol).as("n_vec"),
      F.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    c.join(q, Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .withColumn("cos", F.cosine(col("q_vec"), col("n_vec")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select("qid", "nid", "rnk")
  }
}
