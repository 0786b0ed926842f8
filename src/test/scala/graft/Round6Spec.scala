package graft

import graft.functions.Bm25
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 operators: BM25 build/search index split and the decimal
  * overflow guard.
  */
class Round6Spec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark window filter spark spark"),
    (2L, "window merge stream stream"),
    (3L, "filter filter filter customer"),
    (4L, "vector merge vector stream spark"),
    (5L, "customer spark window"),
    (6L, "slow slow filter slow window")
  ).toDF("doc_id", "text")

  private val queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "filter"),
    1L -> Seq("stream", "vector", "slow"),
    2L -> Seq("customer"))

  test("Bm25: searchIndex over a persisted index equals the in-memory topK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("bm25spec").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val mem = Bm25.topK(corpus, "doc_id", "text", queries, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val idx = Bm25.searchIndex(spark, dir, queries, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mem.nonEmpty)
    assert(idx == mem)
  }

  test("Bm25: index scan prunes to the query terms' bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("bm25prune").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    // one single-term query → the postings scan must touch exactly the
    // buckets that term hashes into (1), not all written buckets
    val written = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(written > 1, "fixture must spread terms over >1 bucket")
    val plan = Bm25.searchIndex(spark, dir, Seq(0L -> Seq("spark")), k = 3)
      .queryExecution.executedPlan.toString
    // partition pruning shows up as a PartitionFilters entry on the scan
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("bucket"))
  }

  test("Bm25: searchIndex handles query terms absent from the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bm25miss").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val got = Bm25.searchIndex(spark, dir,
      Seq(0L -> Seq("spark", "nosuchterm"), 1L -> Seq("zzz")), k = 3)
    val mem = Bm25.topK(corpus, "doc_id", "text",
      Seq(0L -> Seq("spark", "nosuchterm"), 1L -> Seq("zzz")), k = 3)
    assert(got.as[(Long, Long, Long, Long)].collect().toSet ==
      mem.as[(Long, Long, Long, Long)].collect().toSet)
    // query 1 matches nothing → absent, query 0 still ranked
    assert(got.where(col("query_id") === 1L).count() == 0L)
  }

  test("Bm25.guardedDiv: exact integral division on in-range operands") {
    val df = Seq((BigDecimal(7000), BigDecimal(3)))
      .toDF("n", "d")
      .select(col("n").cast(DecimalType(38, 0)).as("n"),
        col("d").cast(DecimalType(38, 0)).as("d"))
    val got = Bm25.guardedDiv(df, "n", "d", "q").select("q")
      .as[Long].collect()
    assert(got.toSeq == Seq(2333L))
  }

  test("Bm25.guardedDiv: a nulled (overflowed) operand raises instead of silently dropping") {
    // non-ANSI decimal overflow manifests as NULL — feed the guard exactly
    // that shape and require a loud failure
    val df = spark.range(1).select(
      lit(null).cast(DecimalType(38, 0)).as("n"),
      lit(3).cast(DecimalType(38, 0)).as("d"))
    val ex = intercept[Exception] {
      Bm25.guardedDiv(df, "n", "d", "q").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("graft.Bm25")))
  }

  test("Bm25: an overflowing score operand fails loudly under the session's decimal mode") {
    // product of two ~1e20 decimals exceeds DECIMAL(38,0): ANSI mode throws
    // at the multiply, non-ANSI nulls and the guard raises — either way the
    // score is never silently wrong
    val big = lit("100000000000000000000").cast(DecimalType(38, 0)) // 1e20
    val df = spark.range(1).select(big.as("a"), big.as("b"))
      .withColumn("n", col("a") * col("b"))
      .withColumn("d", lit(3).cast(DecimalType(38, 0)))
    val ex = intercept[Exception] {
      Bm25.guardedDiv(df, "n", "d", "q").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("graft.Bm25") || m.toLowerCase.contains("overflow") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")))
  }
}
