package graft

import graft.dedup.LineDedup
import graft.etl.{CubeAgg, PivotAggregates, Unpivot}
import graft.functions.Bm25
import org.apache.spark.sql.functions._

/** Round-4 operators: unpivot/melt, cube grains, BM25 retrieval, line-level
  * dedup — hand-computable fixtures.
  */
class Round4Spec extends SparkSpec {

  import spark.implicits._

  test("Bm25.topK matches the hand-computed milli-quantized rational score") {
    // N=3 docs, T=8 tokens; term 'a': df=2, tf(d0)=2, tf(d1)=1
    // d0: floor(1000*3*44*2*8 / (5*(20*2*8 + 6*8 + 18*3*3))) = 796
    // d1: floor(1000*3*44*1*8 / (5*(20*1*8 + 6*8 + 18*2*3))) = 668
    val docs = Seq((0L, "a a b"), (1L, "a c"), (2L, "c c c"))
      .toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text", Seq(0L -> Seq("a")), k = 10)
      .as[(Long, Long, Long, Long)].collect().toList.sorted
    assert(got == List((0L, 1L, 0L, 796L), (0L, 2L, 1L, 668L)))
  }

  test("Bm25.topK sums per-term scores and caps at k with doc_id tie-break") {
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a"), (3L, "b"))
      .toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text",
      Seq(0L -> Seq("a", "b")), k = 2)
      .as[(Long, Long, Long, Long)].collect().toList.sorted
    // d0/d1 match BOTH terms (identical score; doc_id breaks the tie);
    // single-term d2/d3 are cut by k=2
    assert(got.map(_._3) == List(0L, 1L))
    assert(got.head._4 == got(1)._4)
  }

  test("LineDedup strips lines in >= minDocs distinct docs, keeps order") {
    val docs = Seq(
      (0L, "u0\nBOIL\nX"), (1L, "u1\nBOIL"), (2L, "X\nBOIL\nu2"), (3L, "X"))
      .toDF("doc_id", "text")
    val got = LineDedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long, String)].collect().toList.sorted
    assert(got == List(
      (0L, 3L, 2L, "u0"), (1L, 2L, 1L, "u1"), (2L, 3L, 2L, "u2"),
      (3L, 1L, 1L, "")))
  }

  test("LineDedup counts DISTINCT docs: an in-doc repeat is not boilerplate") {
    val docs = Seq((0L, "Y\nY\nu"), (1L, "Y")).toDF("doc_id", "text")
    val got = LineDedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long, String)].collect().toList.sorted
    assert(got == List((0L, 3L, 0L, "Y\nY\nu"), (1L, 1L, 0L, "Y")))
  }

  test("Unpivot.melt inverts countPivot: every (group, value) cell round-trips") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "y"))
      .toDF("g", "p")
    val wide = PivotAggregates.countPivot(df, "g", "p", Seq("x", "y", "z"))
    val long = Unpivot.melt(wide, Seq("g"), Seq("x", "y", "z"), "p", "cnt")
      .as[(String, String, Long)].collect().toSet
    assert(long == Set(
      ("a", "x", 2L), ("a", "y", 1L), ("a", "z", 0L),
      ("b", "x", 0L), ("b", "y", 1L), ("b", "z", 0L)))
  }

  test("Unpivot.melt plans a map-side Expand with no exchange of its own") {
    val wide = Seq(("a", 1L, 2L)).toDF("g", "x", "y")
    val plan = Unpivot.melt(wide, Seq("g"), Seq("x", "y"), "p", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(!plan.contains("Exchange"))
  }

  test("CubeAgg emits all four grains with the GROUPING bitmask") {
    val df = Seq(("s1", "p1", 10.0), ("s1", "p2", 20.0), ("s2", "p1", 30.0))
      .toDF("a", "b", "m")
    val got = CubeAgg.cubeCounts(df, col("a"), col("b"), col("m"))
      .select(coalesce(col("a"), lit("ALL")), coalesce(col("b"), lit("ALL")),
        col("grain_id"), col("n"), col("total"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(got.contains(("ALL", "ALL", 3L, 3L, 60.0))) // grand total grain
    assert(got.contains(("s1", "ALL", 1L, 2L, 30.0))) // b rolled up
    assert(got.contains(("ALL", "p1", 2L, 2L, 40.0))) // a rolled up
    assert(got.contains(("s1", "p1", 0L, 1L, 10.0))) // full grain
    assert(got.size == 3 + 2 + 2 + 1) // 2^2 grains, no extras
  }

  test("CubeAgg grain_id disambiguates a NULL dimension value from a rollup") {
    val df = Seq((Option.empty[String], "p1", 1.0), (Some("s1"), "p1", 2.0))
      .toDF("a", "b", "m")
    val got = CubeAgg.cubeCounts(df, col("a"), col("b"), col("m"))
      .where(col("b") === "p1")
      .select(col("a"), col("grain_id"), col("n"))
      .as[(Option[String], Long, Long)].collect().toSet
    // a=NULL at grain 0 is the genuine null group (n=1); a=NULL at grain 2
    // is the rollup over both rows (n=2)
    assert(got.contains((None, 0L, 1L)))
    assert(got.contains((None, 2L, 2L)))
    assert(got.contains((Some("s1"), 0L, 1L)))
  }
}
