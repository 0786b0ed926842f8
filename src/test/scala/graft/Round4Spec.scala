package graft

import graft.etl.{CubeAgg, PivotAggregates, Unpivot}
import org.apache.spark.sql.functions._

/** Round-4 operators: unpivot/melt, cube grains — hand-computable fixtures. */
class Round4Spec extends SparkSpec {

  import spark.implicits._

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
