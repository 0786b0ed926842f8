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

  test("p = 12 census precision: estimate within the ~1.6%·3σ band") {
    // VERDICT r16 next-task 7: a real vocabulary census wants p = 12-14;
    // σ = 1.04/√4096 ≈ 1.6%, allow 3σ ≈ 5%
    for (n <- Seq(30000, 120000)) {
      val est = Hll.sketch(items(n, "a"), Seq("g"), "h", p = 12)
        .select("estimate").as[Long].head()
      assert(math.abs(est - n).toDouble / n < 0.05,
        s"n=$n estimated $est at p=12 — outside 3σ")
    }
  }

  test("p = 12 keeps the integer invariants: MAX-merge and partition independence") {
    val once = items(50000, "a").union(items(700, "b"))
    val a = Hll.sketch(once.coalesce(1), Seq("g"), "h", p = 12)
      .orderBy("g").collect().toSeq
    val b = Hll.sketch(once.union(once).repartition(16), Seq("g"), "h",
      p = 12).orderBy("g").collect().toSeq
    assert(a == b, "p=12 sketch must be duplicate- and partition-immune")
  }

  test("p = 6 parameterization reproduces the frozen q159 constants") {
    // the q159 byte-stability contract: the general path at p = 6 IS
    // the r16 sketch
    assert(Hll.registers(6) == Hll.NumRegisters)
    assert(Hll.estNumerator(6) == Hll.EstNumerator)
    assert(Hll.linearTable(6) == Hll.LinearTable)
    assert(Hll.smallRange(6) == Hll.SmallRange)
    assert(Hll.rhoCap(6) == 32)
    val df = items(5000, "a")
    val dflt = Hll.sketch(df, Seq("g"), "h").collect().toSeq
    val p6 = Hll.sketch(df, Seq("g"), "h", p = 6).collect().toSeq
    assert(dflt == p6)
  }

  test("every estimator numerator stays a 63-bit signed long across the p window") {
    for (p <- Hll.MinP to Hll.MaxP) {
      val num = Hll.estNumerator(p)
      assert(num > 0L, s"p=$p numerator overflowed")
      assert(Hll.linearTable(p).length == Hll.registers(p))
      // the harmonic sum bound: m·2^C ≤ 2^41
      assert(Hll.registers(p).toLong * (1L << Hll.rhoCap(p)) <= (1L << 41))
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
