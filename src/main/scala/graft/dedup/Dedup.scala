package graft.dedup

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora. Four families:
  * exact (hash groupBy), MinHash+LSH, SimHash, and embedding-cosine —
  * each designed so candidate generation is bounded (never an O(n²)
  * cross join): LSH buckets bound the pair space, exact verification
  * runs only inside buckets.
  */
object ExactDedup {

  /** Keep-first exact dedup: group on the (optionally normalized) content,
    * keep the smallest id. One shuffle on a 64-bit content hash would also
    * work; grouping on the raw key lets Spark's partial aggregation kick in.
    */
  def groups(docs: DataFrame, idCol: String, keyCol: String): DataFrame =
    docs
      .groupBy(col(keyCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The surviving rows after exact dedup. */
  def dedup(docs: DataFrame, idCol: String, keyCol: String): DataFrame =
    docs.join(
      groups(docs, idCol, keyCol).select(col("keep_id").as(idCol)),
      Seq(idCol),
      "left_semi")
}

object MinHashDedup {

  /** Per-doc minhash signature + LSH band buckets.
    * numPerms must be divisible by bands.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numPerms: Int = 128, bands: Int = 16): DataFrame = {
    require(numPerms % bands == 0, "numPerms must be divisible by bands")
    docs
      .select(
        col(idCol),
        F.minhashSig(F.shingles(F.tokensLower(col(textCol)), shingleK), numPerms)
          .as("sig"))
      .withColumn("buckets", F.bandBuckets(col("sig"), bands))
  }

  /** Candidate near-dup pairs: explode band buckets, self-join per
    * (band, bucket), estimate Jaccard as the fraction of equal signature
    * positions, keep pairs ≥ minJaccardPct. The (band,bucket) shuffle key
    * spreads uniformly; pair generation is bounded by bucket occupancy.
    */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numPerms: Int = 128, bands: Int = 16,
      minJaccardPct: Int = 50): DataFrame = {
    val sigs = signatures(docs, idCol, textCol, shingleK, numPerms, bands)
    val exploded = sigs
      .select(col(idCol).as("id"), col("sig"),
        posexplode(col("buckets")).as(Seq("band", "bucket")))
    val l = exploded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = exploded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("eq_positions",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (a, b) => when(a === b, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("est_jaccard_pct",
        (col("eq_positions") * 100 / numPerms).cast("long"))
      .where(col("est_jaccard_pct") >= minJaccardPct)
      .select("id_a", "id_b", "est_jaccard_pct")
  }
}

object SimHashDedup {

  /** 64-bit simhash per document. */
  def hashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), F.simhash64(F.tokensLower(col(textCol))).as("simhash"))

  /** Near-dup pairs within a Hamming ball: block on 16-bit chunks of the
    * simhash (a pair within Hamming distance 3 of a 64-bit hash must agree
    * on at least one of 4 chunks — pigeonhole), verify exact distance.
    */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val h = hashes(docs, idCol, textCol)
    val chunked = h.select(
      col(idCol).as("id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_no"),
          shiftrightunsigned(col("simhash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("c"))
      .select(col("id"), col("simhash"), col("c.chunk_no"), col("c.chunk"))
    val l = chunked.select(col("chunk_no"), col("chunk"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk_no"), col("chunk"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk_no", "chunk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", F.hamming(col("sh_a"), col("sh_b")))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}

object NgramJaccard {

  /** Exact n-gram Jaccard verification over candidate pairs — the precise
    * re-rank step after MinHash candidate generation. Jaccard is computed
    * on distinct word-k-shingle sets with array set ops (codegen'd).
    */
  def verifiedPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numPerms: Int = 128, bands: Int = 16,
      candidateMinPct: Int = 20, minJaccardPct: Int = 50): DataFrame = {
    val cands = MinHashDedup
      .candidatePairs(docs, idCol, textCol, shingleK, numPerms, bands,
        candidateMinPct)
      .select("id_a", "id_b")
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(F.shingles(F.tokensLower(col(textCol)), shingleK))
        .as("shingles"))
    cands
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard_pct",
        (col("inter") * 100 / greatest(col("uni"), lit(1))).cast("long"))
      .where(col("jaccard_pct") >= minJaccardPct)
      .select("id_a", "id_b", "jaccard_pct")
  }
}

object EmbeddingDedup {

  /** Embedding near-dup pairs: random-hyperplane LSH bucket (deterministic,
    * no driver state), in-bucket pair join, exact cosine verification.
    * `planes` trades recall vs bucket size: 2^planes buckets.
    */
  def pairs(embeddings: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, minCosine: Double = 0.95): DataFrame = {
    val bucketed = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      F.hyperplaneBucket(col(vecCol), planes).as("bucket"))
    val l = bucketed.select(col("bucket"), col("id").as("id_a"), col("vec").as("v_a"))
    val r = bucketed.select(col("bucket"), col("id").as("id_b"), col("vec").as("v_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", F.cosine(col("v_a"), col("v_b")))
      .where(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"),
        floor(col("cos") * 1000).cast("long").as("cos_x1000"))
  }
}
