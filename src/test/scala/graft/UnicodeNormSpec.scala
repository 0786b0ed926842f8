package graft

import graft.functions.F
import org.apache.spark.sql.functions._

/** NFC kernel corners (q132) — the oracle proves cross-engine UAX#15
  * agreement at corpus scale; these pin the canonicalization contract.
  */
class UnicodeNormSpec extends SparkSpec {

  private def nfc(s: String): String =
    spark.range(1).select(F.nfc(lit(s)).as("n")).head().getString(0)

  test("combining sequences compose; precomposed text is a fixed point") {
    assert(nfc("café") == "café")
    assert(nfc("Å") == "Å")
    assert(nfc("café") == "café")
    assert(nfc("plain ascii") == "plain ascii")
  }

  test("canonically-equivalent spellings hash identically after nfc") {
    val r = spark.range(1).select(
      F.hash64(F.nfc(lit("café"))).as("a"),
      F.hash64(F.nfc(lit("café"))).as("b"),
      F.hash64(lit("café")).as("rawA"),
      F.hash64(lit("café")).as("rawB")).head()
    assert(r.getLong(0) == r.getLong(1),
      "NFC must make equivalent spellings hash-equal")
    assert(r.getLong(2) != r.getLong(3),
      "without NFC the same text hashes apart — the q132 motivation")
  }
}
