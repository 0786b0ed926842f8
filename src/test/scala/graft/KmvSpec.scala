package graft

import graft.functions.{F, Kmv}
import org.apache.spark.sql.functions._

/** KMV/theta overlap sketch (q127) — the oracle proves the full replay
  * at corpus scale; these pin the gram-kernel contract and the
  * estimator's exact-regime edges on hand-built sets.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("kgramHashes: n-k+1 grams, one fold for short docs, order-sensitive") {
    def g(s: String, k: Int): Seq[Long] = spark.range(1)
      .select(F.kgramHashes(F.tokensLower(lit(s)), k).as("h"))
      .as[Seq[Long]].head()
    assert(g("a b c d e", 3).length == 3)
    assert(g("a b", 3).length == 1, "short doc must emit one fold")
    assert(g("a", 3).length == 1)
    assert(g("a b c", 3) != g("c b a", 3), "grams must be order-sensitive")
    // gram equality is positional: shared grams hash identically
    assert(g("a b c d", 3).head == g("a b c", 3).head)
  }

  test("corpora smaller than k estimate exactly (theta = 2^64)") {
    val a = (1L to 100L).map(i => ("w" + i)).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val b = (51L to 150L).map(i => ("w" + i)).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val r = Kmv.overlapReport(a, b, "h", k = 512)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2))).toMap
    assert(r("a") == ((100L, 100L)))
    assert(r("b") == ((100L, 100L)))
    assert(r("union") == ((150L, 150L)))
    assert(r("overlap") == ((50L, 50L)))
  }

  test("disjoint corpora overlap to zero; identical corpora to the union") {
    val a = (1L to 40L).map(i => "x" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val b = (1L to 40L).map(i => "y" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val dj = Kmv.overlapReport(a, b, "h", k = 16)
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(dj("overlap") == 0L && dj("union") == 80L)
    val same = Kmv.overlapReport(a, a, "h", k = 16)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2))).toMap
    assert(same("overlap") == same("union"),
      "identical corpora must estimate overlap == union")
    assert(same("a") == same("b"))
  }

  test("full-sketch boundary: exactly k distinct values flips to the θ estimator") {
    // side a holds EXACTLY k distinct values: the sketch is full
    // (ca == k), θ = the largest retained hash, r = k−1 — the test
    // replays the quantized 63-bit estimator independently with BigInt
    // so an engine-side estimator change cannot silently pass
    val k = 64
    val a = (1L to k.toLong).map(i => "kb" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val bEmptyish = Seq("kb1").toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val r = Kmv.overlapReport(a, bEmptyish, "h", k = k)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2))).toMap
    val m64 = BigInt(1) << 64
    val hashes = a.as[Long].collect()
      .map(h => if (h < 0) BigInt(h) + m64 else BigInt(h))
    val theta = hashes.max
    val thq = (theta >> 14).max(BigInt(1))
    val expected = ((BigInt(k - 1) << 50) / thq).toLong
    assert(r("a") == ((expected, k.toLong)),
      s"full-sketch estimate must be floor((k-1)*2^50/floor(theta/2^14))")
    // one-below-full stays in the exact regime (θ = 2^64)
    val a1 = (1L to (k - 1).toLong).map(i => "kb" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val r1 = Kmv.overlapReport(a1, bEmptyish, "h", k = k)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r1("a") == (k - 1).toLong, "unfull sketch must be exact")
  }

  test("k outside (1, 2048] is rejected (union numerator must fit 63 bits)") {
    val a = Seq("z").toDF("t").select(F.hash64(col("t")).as("h"))
    intercept[IllegalArgumentException] {
      Kmv.overlapReport(a, a, "h", k = 4096)
    }
    intercept[IllegalArgumentException] {
      Kmv.overlapReport(a, a, "h", k = 1)
    }
  }

  test("full sketches estimate within the 1/sqrt(k) band on random sets") {
    // 2000 distinct values per side, 1000 shared; k=256 ⇒ rse ~6.3%;
    // assert a generous 4-sigma band so the test never flakes while
    // still catching an off-by-2x estimator bug
    val a = (1L to 2000L).map(i => "s" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val b = (1001L to 3000L).map(i => "s" + i).toDF("t")
      .select(F.hash64(col("t")).as("h"))
    val r = Kmv.overlapReport(a, b, "h", k = 256)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2))).toMap
    for ((scope, (est, exact)) <- r) {
      assert(math.abs(est - exact) <= exact / 4 + 64,
        s"$scope estimate $est too far from exact $exact")
    }
    assert(r("union")._2 == 3000L && r("overlap")._2 == 1000L)
  }
}
