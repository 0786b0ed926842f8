package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom filter over 64-bit keys (Bloom 1970, public): `numBits` bits set
  * through `numHashes` splitmix64-derived probes per key. No false
  * negatives ever; false-positive rate ≈ (1 - e^(-kn/m))^k. Mergeable by
  * bitwise OR, so it builds as a typed Aggregator with constant state per
  * partition — the engine's runtime-filter primitive (see
  * [[graft.etl.BloomSemiJoin]]).
  */
final case class BloomF(numHashes: Int, words: Array[Long]) {

  private def numBits: Long = words.length.toLong * 64

  def add(key: Long): BloomF = {
    var i = 0
    while (i < numHashes) {
      val h = Hashing.mix(key ^ (0x9e3779b97f4a7c15L * (i + 1)))
      val idx = (((h % numBits) + numBits) % numBits).toInt
      words(idx >> 6) |= (1L << (idx & 63))
      i += 1
    }
    this
  }

  def merge(other: BloomF): BloomF = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def mightContain(key: Long): Boolean =
    Hashing.bloomContains(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(words),
      numHashes, key)
}

object BloomF {
  def empty(numBits: Int, numHashes: Int): BloomF = {
    require(numBits % 64 == 0 && numBits > 0, "numBits must be a multiple of 64")
    BloomF(numHashes, new Array[Long](numBits / 64))
  }
}

class BloomAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[java.lang.Long, BloomF, BloomF] {
  override def zero: BloomF = BloomF.empty(numBits, numHashes)
  override def reduce(b: BloomF, a: java.lang.Long): BloomF =
    if (a == null) b else b.add(a.longValue())
  override def merge(b1: BloomF, b2: BloomF): BloomF = b1.merge(b2)
  override def finish(r: BloomF): BloomF = r
  override def bufferEncoder: Encoder[BloomF] = Encoders.product[BloomF]
  override def outputEncoder: Encoder[BloomF] = Encoders.product[BloomF]
}

object Bloom {

  /** Column aggregate: Bloom filter of a long key column. */
  def sketch(c: Column, numBits: Int = 1 << 16, numHashes: Int = 4): Column =
    udaf(new BloomAggregator(numBits, numHashes)).apply(c)
}
