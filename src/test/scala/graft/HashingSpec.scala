package graft

import graft.functions.{Hashing, RomanCodec}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property/invariant tests for the hashing kernels and the roman codec —
  * the correctness gate for the [rows-only] sketch queries (q18/q26/q31's
  * kernels) that DuckDB cannot recompute. Property checks run over seeded
  * deterministic samples (no scalacheck-bridge dependency available
  * offline).
  */
class HashingSpec extends AnyFunSuite {

  private def arr(ss: String*) =
    new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])

  test("roman codec round-trips every value 1..3999") {
    (1 to 3999).foreach { n =>
      assert(RomanCodec.fromRomanStr(RomanCodec.toRomanStr(n)) == n)
    }
  }

  test("roman codec rejects malformed and out-of-range input") {
    assert(RomanCodec.toRomanStr(0) == null)
    assert(RomanCodec.toRomanStr(4000) == null)
    Seq("IIII", "VX", "MMMM", "ABC", "").foreach { s =>
      assert(RomanCodec.fromRomanStr(s) == 0, s"'$s' should be invalid")
    }
  }

  test("hash64 is deterministic and input-sensitive") {
    val a = Hashing.hash64(UTF8String.fromString("hello"), 0L)
    assert(a == Hashing.hash64(UTF8String.fromString("hello"), 0L))
    assert(a != Hashing.hash64(UTF8String.fromString("hellp"), 0L))
    assert(a != Hashing.hash64(UTF8String.fromString("hello"), 1L))
  }

  test("hamming matches bitCount of xor") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      assert(Hashing.hamming(a, b) == java.lang.Long.bitCount(a ^ b))
    }
  }

  test("minhash estimate tracks exact jaccard within 10 points at 128 perms") {
    // two overlapping shingle sets with known jaccard
    val common = (1 to 60).map(i => s"c$i")
    val onlyA = (1 to 20).map(i => s"a$i")
    val onlyB = (1 to 20).map(i => s"b$i")
    val sigA = Hashing.minhashSig(arr(common ++ onlyA: _*), 128)
    val sigB = Hashing.minhashSig(arr(common ++ onlyB: _*), 128)
    val eq = (0 until 128).count(i => sigA.getLong(i) == sigB.getLong(i))
    val est = eq * 100.0 / 128
    val exact = 60.0 * 100 / 100 // |∩|=60, |∪|=100
    assert(math.abs(est - exact) <= 10, s"est $est vs exact $exact")
  }

  test("minhash signature of identical input is identical; empty input is unsigned max") {
    val s1 = Hashing.minhashSig(arr("x", "y", "z"), 64)
    val s2 = Hashing.minhashSig(arr("x", "y", "z"), 64)
    assert((0 until 64).forall(i => s1.getLong(i) == s2.getLong(i)))
    val e = Hashing.minhashSig(new GenericArrayData(Array.empty[Any]), 8)
    assert((0 until 8).forall(i => e.getLong(i) == -1L))
  }

  test("band buckets collide on equal bands and differ on disjoint signatures") {
    val s1 = Hashing.minhashSig(arr((1 to 50).map(i => s"t$i"): _*), 128)
    val s2 = Hashing.minhashSig(arr((100 to 150).map(i => s"u$i"): _*), 128)
    val b1 = Hashing.bandBuckets(s1, 16)
    val b11 = Hashing.bandBuckets(s1, 16)
    val b2 = Hashing.bandBuckets(s2, 16)
    assert((0 until 16).forall(i => b1.getLong(i) == b11.getLong(i)))
    assert((0 until 16).exists(i => b1.getLong(i) != b2.getLong(i)))
  }

  test("simhash of a 10%-perturbed token stream stays within a small hamming ball") {
    val base = (1 to 100).map(i => s"tok$i")
    val near = base.updated(5, "X").updated(50, "Y").updated(95, "Z")
    val far = (1 to 100).map(i => s"other$i")
    val h0 = Hashing.simhash64(arr(base: _*))
    val hn = Hashing.simhash64(arr(near: _*))
    val hf = Hashing.simhash64(arr(far: _*))
    assert(Hashing.hamming(h0, hn) <= 12)
    assert(Hashing.hamming(h0, hf) > 12)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val ab = Hashing.fingerprint(arr("a", "b"))
    val ba = Hashing.fingerprint(arr("b", "a"))
    assert(ab != ba)
    assert(ab == Hashing.fingerprint(arr("a", "b")))
  }

  test("cosine and dot agree with hand-computed values") {
    def farr(vs: Float*) = new GenericArrayData(vs.toArray[Any])
    assert(Hashing.cosineF(farr(1f, 0f), farr(1f, 0f)) == 1.0)
    assert(Hashing.cosineF(farr(1f, 0f), farr(0f, 1f)) == 0.0)
    assert(math.abs(Hashing.cosineF(farr(1f, 1f), farr(1f, 0f)) - math.sqrt(0.5)) < 1e-9)
    assert(Hashing.dotF(farr(1f, 2f, 3f), farr(4f, 5f, 6f)) == 32.0)
    // zero-norm guard
    assert(Hashing.cosineF(farr(0f, 0f), farr(1f, 1f)) == 0.0)
  }

  test("hyperplane codes: same vector → same codes; tables differ from each other") {
    val v = new GenericArrayData((1 to 16).map(_.toFloat).toArray[Any])
    val c1 = Hashing.hyperplaneCodes(v, 8, 16)
    val c2 = Hashing.hyperplaneCodes(v, 8, 16)
    assert((0 until 16).forall(i => c1.getLong(i) == c2.getLong(i)))
    // 16 independent 8-bit codes of one vector shouldn't all collapse to one value
    assert((0 until 16).map(c1.getLong).distinct.size > 1)
  }

  test("hyperplane codes of a vector and its negation are bitwise complements") {
    // irregular components so no ±1-signed projection sums to exactly 0
    // (a zero projection maps both signs to bit 1 — not a complement)
    val vs = (1 to 16).map(i => (i * 1.37f + 0.2131f * i * i))
    val v = new GenericArrayData(vs.toArray[Any])
    val neg = new GenericArrayData(vs.map(-_).toArray[Any])
    val cv = Hashing.hyperplaneCodes(v, 8, 4)
    val cn = Hashing.hyperplaneCodes(neg, 8, 4)
    // sign flips every plane (ties at exactly 0 both go to 1, but a strictly
    // nonzero projection flips) — with this vector projections are nonzero
    (0 until 4).foreach { t =>
      assert((cv.getLong(t) ^ cn.getLong(t)) == 0xffL)
    }
  }

  test("winnowing: shared runs of length >= w+k-1 share a fingerprint; short docs keep one") {
    val k = 4; val w = 6
    val shared = (1 to 20).map(i => s"run$i") // 20 >= w+k-1 = 9
    val docA = (1 to 30).map(i => s"a$i") ++ shared ++ (1 to 10).map(i => s"a2$i")
    val docB = (1 to 15).map(i => s"b$i") ++ shared ++ (1 to 25).map(i => s"b2$i")
    val docC = (1 to 60).map(i => s"c$i")
    def fps(ts: Seq[String]) =
      (0 until Hashing.winnow(arr(ts: _*), k, w).numElements())
        .map(Hashing.winnow(arr(ts: _*), k, w).getLong).toSet
    val (fa, fb, fc) = (fps(docA), fps(docB), fps(docC))
    assert((fa intersect fb).nonEmpty, "guaranteed shared fingerprint missing")
    assert((fa intersect fc).isEmpty, "unrelated docs share a fingerprint")
    // density: winnowing keeps roughly 2/(w+1) of grams, far fewer than all
    assert(fa.size < docA.size && fa.size > 2)
    val short = Hashing.winnow(arr("only", "three", "tokens"), k, w)
    assert(short.numElements() == 1)
    assert(Hashing.winnow(arr(), k, w).numElements() == 0)
  }

  test("hash64 avalanche: single-char change flips roughly half the bits") {
    val rnd = new scala.util.Random(13)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString
      val h1 = Hashing.hash64(UTF8String.fromString(s), 0L)
      val h2 = Hashing.hash64(UTF8String.fromString(s + "x"), 0L)
      val d = java.lang.Long.bitCount(h1 ^ h2)
      assert(d >= 8 && d <= 56, s"'$s': $d flipped bits")
    }
  }
}
