package graft

import graft.functions.{Bpe, BpeKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** BPE trainer + distributed encoder — the gate for [rows-only] q47. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("trainer learns the most frequent pairs first, deterministically") {
    val words = Seq.fill(10)("low") ++ Seq.fill(6)("lower") ++ Seq.fill(3)("newest")
    val merges = Bpe.trainFromWords(words, 4)
    // 'l o' appears 16 times — must be the first merge; then 'lo w' (16)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    assert(Bpe.trainFromWords(words, 4) == merges, "training must be deterministic")
  }

  test("trainer stops when no pairs remain") {
    assert(Bpe.trainFromWords(Seq("a", "b"), 10).isEmpty)
    assert(Bpe.trainFromWords(Seq("ab"), 10) == Seq(("a", "b")))
  }

  test("encoder collapses trained words and leaves unseen text at character granularity") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "e"), ("lowe", "r"))
    val spec = UTF8String.fromString(Bpe.mergesToSpec(merges))
    def count(s: String) = BpeKernels.encodeCount(UTF8String.fromString(s), spec)
    assert(count("low") == 1L)       // fully merged
    assert(count("lower") == 1L)     // full chain
    assert(count("lows") == 2L)      // low + s
    assert(count("xyz") == 3L)       // no merges apply
    assert(count("low low low") == 3L)
    assert(count("LOW") == 1L, "encoder lower-cases like the trainer")
  }

  test("fixed-table encode: rank priority, chained pairs, second-order merges") {
    // the q47b table; hand-computed counts pin the greedy
    // lowest-rank-first semantics the oracle's rank-order rewrite
    // must reproduce
    def n(text: String, merges: Seq[(String, String)]): Long =
      BpeKernels.encodeCount(UTF8String.fromString(text),
        UTF8String.fromString(Bpe.mergesToSpec(merges)))
    val t = Seq("a" -> "g", "s" -> "c", "a" -> "n", "l" -> "e",
      "b" -> "le", "r" -> "o")
    assert(n("scan", t) == 2L)     // s+c, then a+n
    assert(n("table", t) == 3L)    // l+e, then b+le (second-order)
    assert(n("agg", t) == 2L)      // leftmost a+g; (g,g) is no rule
    assert(n("anan", t) == 2L)     // chained same-rank pair merges twice
    assert(n("ananan", t) == 3L)   // chain of three
    assert(n("agan", t) == 2L)     // rank 0 (a,g) beats rank 2 (a,n)
    assert(n("order", t) == 5L)    // no rule fires
    assert(n("scan table", t) == 5L)
  }

  test("distributed encode matches the kernel and compresses real text") {
    val docs = Tables(spark, sf0001).documents.limit(200)
    val merges = Bpe.train(docs, "doc_id", "text", nMerges = 100,
      sampleBasisPoints = 5000)
    // the tiny synthetic vocabulary may exhaust its pairs before nMerges
    assert(merges.size > 50 && merges.size <= 100)
    val out = docs.select(col("doc_id"),
      Bpe.tokenCount(col("text"), merges).as("n_bpe"),
      length(regexp_replace(col("text"), "\\s+", "")).as("n_chars"))
      .as[(Long, Long, Long)].collect()
    // BPE must compress below character count but stay above zero
    out.foreach { case (id, nBpe, nChars) =>
      assert(nBpe > 0 && nBpe < nChars, s"doc $id: $nBpe vs $nChars chars")
    }
    // spot-check one row against a driver-side kernel call
    val one = docs.orderBy("doc_id").limit(1)
      .select(col("text"), Bpe.tokenCount(col("text"), merges).as("n"))
      .as[(String, Long)].head()
    val local = BpeKernels.encodeCount(UTF8String.fromString(one._1),
      UTF8String.fromString(Bpe.mergesToSpec(merges)))
    assert(one._2 == local)
  }

  test("fertility report: group-total ratios, empty docs, UTF-8 bytes") {
    import spark.implicits._
    // merges a|g: "bag" -> |b|ag| = 2 tokens. x: 2 words, 4 bpe tokens,
    // 7 bytes -> fertility 2000, bytes/bpe 1750. y: empty doc -> zero
    // counters and NULL ratios (no division). z: "héllo", no merge
    // applies -> 5 tokens, 6 UTF-8 bytes -> 5000 and 1200.
    val docs = Seq(("x", "bag bag"), ("y", ""), ("z", "héllo"))
      .toDF("lang", "text")
    val out = Bpe.fertilityByGroup(docs, "lang", "text", Seq("a" -> "g"))
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val x = out("x")
    assert(x.getAs[Long]("n_words") == 2L &&
      x.getAs[Long]("n_bpe_tokens") == 4L && x.getAs[Long]("n_bytes") == 7L)
    assert(x.getAs[Long]("fertility_x1000") == 2000L &&
      x.getAs[Long]("bytes_per_bpe_x1000") == 1750L)
    val y = out("y")
    assert(y.getAs[Long]("n_docs") == 1L && y.getAs[Long]("n_words") == 0L &&
      y.getAs[Long]("n_bpe_tokens") == 0L)
    assert(y.isNullAt(y.fieldIndex("fertility_x1000")) &&
      y.isNullAt(y.fieldIndex("bytes_per_bpe_x1000")),
      "zero-token groups must yield NULL ratios, not divide")
    val z = out("z")
    assert(z.getAs[Long]("n_bpe_tokens") == 5L &&
      z.getAs[Long]("n_bytes") == 6L)
    assert(z.getAs[Long]("fertility_x1000") == 5000L &&
      z.getAs[Long]("bytes_per_bpe_x1000") == 1200L)
  }

  test("distributed trainer matches the sequential trainer merge-for-merge") {
    // fixture with repeated words, chained merges, ties, and words that
    // exhaust to a single symbol
    val docs = Seq(
      (0L, "low low low lower lowest"),
      (1L, "newest newer new nest"),
      (2L, "Low LOWER a b ab ab"),
      (3L, "test nest best rest"),
      (4L, "aaaa aa a")
    ).toDF("doc_id", "text")
    import spark.implicits._
    val words = docs.select(lower(col("text"))).as[String].collect().toSeq
      .flatMap(_.split("\\s+"))
    for (n <- Seq(1, 3, 8, 20)) {
      val seq = Bpe.trainFromWords(words, n)
      val dist = Bpe.trainDistributed(docs, "doc_id", "text", n)
      assert(dist == seq, s"nMerges=$n: distributed diverged\n" +
        s" seq  = $seq\n dist = $dist")
    }
    // the distributed path also stops when no pairs remain
    val single = Seq((0L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.trainDistributed(single, "doc_id", "text", 5).isEmpty)
  }

  test("distributed trainer on the sf0.001 corpus equals a full-corpus sequential train") {
    val docs = Tables(spark, sf0001).documents
    import spark.implicits._
    val words = docs.select(lower(col("text"))).as[String].collect().toSeq
      .flatMap(_.split("\\s+"))
    val seq = Bpe.trainFromWords(words, 12)
    val dist = Bpe.trainDistributed(docs, "doc_id", "text", 12)
    assert(dist == seq)
  }
}
