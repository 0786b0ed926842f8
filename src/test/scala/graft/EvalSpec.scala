package graft

import graft.functions.Eval
import org.apache.spark.sql.functions._

/** Eval.rocAudit laws the q160 oracle can't isolate: the rank-form AUC
  * equals the brute-force pair count (ties at half credit), the
  * closed-form deciles equal Spark's own ntile, and the edge regimes
  * (perfect separation, all-tied scores, n < bins).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic labeled fixture with heavy score ties. */
  private def fixture(n: Int) =
    (0 until n).map { i =>
      val h = graft.functions.Hashing.murmur64(i.toLong)
      val score = (h & 15L) - 8L // 16 distinct values → many ties
      val y = if ((h >>> 7 & 31L) < (score + 12L)) 1L else 0L
      (i.toLong, score, y)
    }.toDF("id", "s", "y")

  /** Brute-force AUC: pairs won + half the tied pairs, over P·N. */
  private def bruteAuc(rows: Seq[(Long, Long, Long)]): Long = {
    val pos = rows.filter(_._3 == 1L).map(_._2)
    val neg = rows.filter(_._3 == 0L).map(_._2)
    var num2 = BigInt(0)
    for (p <- pos; q <- neg)
      num2 += (if (p > q) 2 else if (p == q) 1 else 0)
    ((num2 * 1000000) / (BigInt(pos.size) * neg.size * 2)).toLong
  }

  test("rank-form AUC equals the brute-force pair count, ties included") {
    val df = fixture(500)
    val got = Eval.rocAudit(df, "id", "s", "y")
      .select("auc_x1e6").distinct().as[Long].collect().toSeq
    val want = bruteAuc(df.as[(Long, Long, Long)].collect().toSeq)
    assert(got == Seq(want), s"rank AUC $got != brute $want")
  }

  test("closed-form deciles equal Spark's own ntile") {
    for (n <- Seq(503, 500, 7)) {
      val df = fixture(n)
      val w = org.apache.spark.sql.expressions.Window.orderBy("s", "id")
      val want = df.withColumn("t", ntile(10).over(w))
        .groupBy("t").agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
        .select(col("t").cast("long"), col("n"), col("np"))
        .as[(Long, Long, Long)].collect().toSet
      val got = Eval.rocAudit(df, "id", "s", "y")
        .select(col("decile"), col("n"), col("n_pos"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want, s"n=$n decile split diverged from ntile")
    }
  }

  test("distributed prefix sums ≡ the global window, any partitioning") {
    // VERDICT r16 task 3: the range-partition + broadcast-offsets build
    // must reproduce the unpartitioned Window.orderBy cumulative counts
    // byte-identically
    val bys = fixture(503).groupBy(col("s")).agg(
      sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = bys
      .withColumn("below_n", coalesce(sum(col("nn")).over(w), lit(0L)))
      .withColumn("below_all",
        coalesce(sum(col("np") + col("nn")).over(w), lit(0L)))
      .orderBy("s").collect().toSeq
    for (parts <- Seq(1, 13)) {
      val got = Eval.cumBelowFrame(bys.repartition(parts))
        .orderBy("s").collect().toSeq
      assert(got == want, s"parts=$parts distributed cum diverged")
    }
  }

  test("single-class corpora report auc 0 through the guarded divisor") {
    // ADVICE r16: p·n·2 = 0 must not NULL (or ANSI-error) the AUC
    val allPos = (0 until 40).map(i => (i.toLong, (i % 5).toLong, 1L))
      .toDF("id", "s", "y")
    assert(Eval.rocAudit(allPos, "id", "s", "y")
      .select("auc_x1e6").distinct().as[Long].head() == 0L)
    val allNeg = (0 until 40).map(i => (i.toLong, (i % 5).toLong, 0L))
      .toDF("id", "s", "y")
    assert(Eval.rocAudit(allNeg, "id", "s", "y")
      .select("auc_x1e6").distinct().as[Long].head() == 0L)
  }

  test("perfect separation → AUC 1e6; all-tied → 5e5") {
    val perfect = (0 until 100).map(i =>
      (i.toLong, if (i < 50) 10L else 0L, if (i < 50) 1L else 0L))
      .toDF("id", "s", "y")
    assert(Eval.rocAudit(perfect, "id", "s", "y")
      .select("auc_x1e6").distinct().as[Long].head() == 1000000L)
    val tied = (0 until 100).map(i => (i.toLong, 7L, (i % 2).toLong))
      .toDF("id", "s", "y")
    assert(Eval.rocAudit(tied, "id", "s", "y")
      .select("auc_x1e6").distinct().as[Long].head() == 500000L)
  }
}
