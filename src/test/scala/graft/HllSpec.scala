package graft

import graft.functions.{F, Hll}
import org.apache.spark.sql.functions._

/** HLL sketch invariants the q159 oracle can't isolate: accuracy on a
  * known cardinality, duplicate immunity (the MAX-merge property), and
  * partitioning independence (the sketch must be byte-identical however
  * the cluster splits the scan).
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def items(n: Int, group: String) =
    (0 until n).map(i => (group, s"item_${group}_$i")).toDF("g", "tok")
      .select(col("g"), F.hash64(col("tok")).as("h"))

  test("estimate lands within the ~13% HLL band for 64 registers") {
    for (n <- Seq(500, 5000, 20000)) {
      val est = Hll.sketch(items(n, "a"), Seq("g"), "h")
        .select("est_hll").as[Long].head()
      // σ = 1.04/√64 ≈ 13%; allow 3σ
      assert(math.abs(est - n).toDouble / n < 0.39,
        s"n=$n estimated $est — outside 3σ")
    }
  }

  test("duplicates cannot move the sketch (MAX-merge property)") {
    val once = items(3000, "a")
    val thrice = once.union(once).union(once)
    val a = Hll.sketch(once, Seq("g"), "h").collect().toSeq
    val b = Hll.sketch(thrice, Seq("g"), "h").collect().toSeq
    assert(a == b, "tripled input must yield the identical sketch")
  }

  test("partitioning independence: 1 vs 16 partitions, byte-identical") {
    val base = items(8000, "a").union(items(300, "b"))
    val one = Hll.sketch(base.coalesce(1), Seq("g"), "h")
      .orderBy("g").collect().toSeq
    val many = Hll.sketch(base.repartition(16), Seq("g"), "h")
      .orderBy("g").collect().toSeq
    assert(one == many)
  }

  test("small-range selection: linear counting kicks in and is tighter") {
    for (n <- Seq(10, 31, 80)) {
      val r = Hll.sketch(items(n, "a"), Seq("g"), "h").collect()(0)
      val est = r.getAs[Long]("estimate")
      // linear counting at V>0 keeps tiny cardinalities within ~25%
      assert(math.abs(est - n).toDouble / n < 0.25,
        s"n=$n estimate $est — linear counting should be tight here")
    }
  }

  test("v_zero and s_harmonic are consistent: empty-ish group") {
    // one item → 63 untouched registers, S dominated by 63·2^32
    val r = Hll.sketch(items(1, "z"), Seq("g"), "h").collect()(0)
    assert(r.getAs[Long]("v_zero") == 63L)
    val s = r.getAs[Long]("s_harmonic")
    assert(s > 63L * (1L << 32) && s <= 64L * (1L << 32))
  }
}
