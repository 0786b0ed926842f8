package graft

import graft.functions.{Cms, CountMin}
import org.apache.spark.sql.functions._

/** Count-min sketch aggregator: overestimate-only guarantee, mergeability,
  * and distributed-vs-local parity.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  test("estimates never undercount and are tight for heavy hitters") {
    val words = Seq.fill(500)("heavy") ++ Seq.fill(100)("medium") ++
      (1 to 200).map(i => s"rare$i")
    val sk = words.foldLeft(Cms.empty(4, 1024))((s, w) => s.add(w))
    assert(sk.estimate("heavy") >= 500L)
    assert(sk.estimate("heavy") <= 520L, "heavy hitter estimate should be tight")
    assert(sk.estimate("medium") >= 100L)
    assert(sk.estimate("never-seen") <= 5L)
  }

  test("merge of partial sketches equals the sketch of the union") {
    val a = Seq("x", "x", "y").foldLeft(Cms.empty(4, 256))((s, w) => s.add(w))
    val b = Seq("x", "z").foldLeft(Cms.empty(4, 256))((s, w) => s.add(w))
    val m = a.merge(b)
    val whole = Seq("x", "x", "y", "x", "z")
      .foldLeft(Cms.empty(4, 256))((s, w) => s.add(w))
    assert(m.counts.toSeq == whole.counts.toSeq)
  }

  test("the aggregator builds the same sketch distributed as locally") {
    val words = (1 to 2000).map(i => s"w${i % 50}")
    val df = words.toDF("w").repartition(8)
    val distributed = df.agg(CountMin.sketch(col("w")).as("sk"))
      .select("sk.*").as[(Int, Int, Array[Long])].head()
    val local = words.foldLeft(Cms.empty(4, 1024))((s, w) => s.add(w))
    assert(distributed._3.toSeq == local.counts.toSeq,
      "distributed merge must equal sequential build")
    val sk = Cms(distributed._1, distributed._2, distributed._3)
    assert(sk.estimate("w7") >= 40L)
  }
}
