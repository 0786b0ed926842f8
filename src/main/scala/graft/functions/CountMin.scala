package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch (Cormode & Muthukrishnan 2005, public): a fixed-size
  * mergeable frequency summary. `depth` independent hash rows of `width`
  * counters; estimate(item) = min over rows — always an OVERestimate,
  * within ε·N of truth with probability 1-δ (ε ≈ e/width, δ ≈ e^-depth).
  */
final case class Cms(depth: Int, width: Int, counts: Array[Long]) {

  def add(item: String, by: Long = 1L): Cms = {
    val h = Hashing.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(item), 0L)
    var d = 0
    while (d < depth) {
      val idx = ((Hashing.mix(h ^ (d + 1).toLong) % width + width) % width).toInt
      counts(d * width + idx) += by
      d += 1
    }
    this
  }

  def merge(other: Cms): Cms = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    this
  }

  def estimate(item: String): Long = {
    val h = Hashing.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(item), 0L)
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val idx = ((Hashing.mix(h ^ (d + 1).toLong) % width + width) % width).toInt
      val c = counts(d * width + idx)
      if (c < min) min = c
      d += 1
    }
    min
  }
}

object Cms {
  def empty(depth: Int, width: Int): Cms =
    Cms(depth, width, new Array[Long](depth.toLong.toInt * width))
}

/** Typed Aggregator building a count-min sketch over a string column —
  * the custom-UDAF surface of the engine: partial sketches build
  * map-side, merge associatively in the reduce (constant state per
  * partition regardless of cardinality), and the finished sketch answers
  * point frequency queries driver-side.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Cms, Cms] {
  override def zero: Cms = Cms.empty(depth, width)
  override def reduce(b: Cms, a: String): Cms =
    if (a == null) b else b.add(a)
  override def merge(b1: Cms, b2: Cms): Cms = b1.merge(b2)
  override def finish(r: Cms): Cms = r
  override def bufferEncoder: Encoder[Cms] = Encoders.product[Cms]
  override def outputEncoder: Encoder[Cms] = Encoders.product[Cms]
}

object CountMin {

  /** Column aggregate: count-min sketch of a string column. */
  def sketch(c: Column, depth: Int = 4, width: Int = 1024): Column =
    udaf(new CountMinAggregator(depth, width)).apply(c)
}
