package graft

import graft.etl.DomainCap
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Per-domain contribution capping (q136) — the oracle proves the
  * full fixture; these pin the selection semantics on hand-built
  * corpora where the expected keep-set is computed independently.
  */
class DomainCapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)], capBp: Int) =
    DomainCap.cap(rows.toDF("id", "dom", "w"), "id", "dom", "w", capBp)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

  test("over-cap domain keeps exactly its hash-order prefix; tail keeps all") {
    // domain a: 10 docs of weight 10; domain b: 2 docs of weight 5.
    // total 110, cap 50% = 55 -> a keeps 5 docs (50 <= 55, 6th hits 60),
    // b keeps both.
    val rows = (0L until 10L).map(i => (i, "a", 10L)) ++
      Seq((10L, "b", 5L), (11L, "b", 5L))
    val kept = run(rows, 5000)
    assert(kept(10L) && kept(11L), "tail domain must keep everything")
    val aKept = (0L until 10L).filter(kept)
    assert(aKept.size == 5, s"cap must cut a to 5 docs, kept $aKept")
    // the kept five are the five smallest by the deterministic hash order
    val expected = (0L until 10L)
      .sortBy(i => (Hashing.murmur64(i) >>> 1, i)).take(5).toSet
    assert(aKept.toSet == expected, "keep-set is not the hash-order prefix")
  }

  test("a single document heavier than the cap is dropped outright") {
    // total 120, cap 10% = 12: the 100-weight doc exceeds the cap at
    // whatever rank it lands; the 10-weight docs keep only while their
    // own running sum fits.
    val rows = Seq((1L, "a", 100L), (2L, "a", 10L), (3L, "b", 10L))
    val kept = run(rows, 1000)
    assert(!kept(1L), "an over-cap doc must never be kept")
    assert(kept(3L), "domain b (10 of 120) is under the cap")
  }

  test("a domain exactly at the cap is kept in full (<=, not <)") {
    val rows = Seq((1L, "a", 10L), (2L, "b", 90L))
    // cap 10% of 100 = 10: domain a's single doc sits exactly on it
    assert(run(rows, 1000)(1L))
  }

  test("quality cap keeps the BEST docs; hash only breaks score ties") {
    // domain a: 4 docs of weight 10, qualities 1/9/5/9; domain b: one
    // doc. total 50, cap 50% = 25 -> a keeps exactly its two q=9 docs
    // (cum 20 <= 25; the q=5 doc would hit 30), b keeps its doc.
    val rows = Seq((1L, "a", 10L, 1L), (2L, "a", 10L, 9L),
      (3L, "a", 10L, 5L), (4L, "a", 10L, 9L), (5L, "b", 10L, 0L))
      .toDF("id", "dom", "w", "q")
    val kept = DomainCap.capByQuality(rows, "id", "dom", "w", "q", 5000)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(kept(2L) && kept(4L), "the two best docs must survive")
    assert(!kept(3L) && !kept(1L), "worse docs are what the cap discards")
    assert(kept(5L))
    // constant quality degenerates to the hash order — byte-identical
    // keep-set to cap(), so the tie-break is pinned to the same key
    val flat = (0L until 10L).map(i => (i, "a", 10L, 7L)) ++
      Seq((10L, "b", 5L, 7L), (11L, "b", 5L, 7L))
    val viaQ = DomainCap.capByQuality(flat.toDF("id", "dom", "w", "q"),
        "id", "dom", "w", "q", 5000)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val viaHash = run(flat.map(t => (t._1, t._2, t._3)), 5000)
    assert(viaQ == viaHash,
      "constant-quality keep-set must equal the hash-order cap")
  }

  test("capBp outside (0, 10000] is refused") {
    val df = Seq((1L, "a", 1L)).toDF("id", "dom", "w")
    intercept[IllegalArgumentException] {
      DomainCap.cap(df, "id", "dom", "w", 0)
    }
    intercept[IllegalArgumentException] {
      DomainCap.cap(df, "id", "dom", "w", 10001)
    }
  }
}
