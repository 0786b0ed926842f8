package graft

import graft.ann.Pca
import org.apache.spark.sql.functions._

/** Pca.topComponent laws the q164 oracle can't isolate: planted
  * anisotropy recovery, partitioning independence, and the centering
  * contract (a constant shift moves nothing).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** n vectors in 8 dims: strong variance along `axis` (±spread), weak
    * hash noise elsewhere. All components are DYADIC (multiples of
    * 1/16) so float adds and ×1000 double quantization stay exact —
    * the centering-contract test shifts these by an integer.
    */
  private def planted(n: Int, axis: Int, spread: Float) =
    (0 until n).map { i =>
      val h = graft.functions.Hashing.murmur64(i.toLong)
      val v = Array.tabulate(8) { d =>
        val noise = (((h >>> (4 * d)) & 15L) - 8L).toFloat / 16f
        if (d == axis) (if (i % 2 == 0) spread else -spread) + noise
        else noise
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")

  test("power iteration finds the planted dominant axis, sign from the init") {
    val df = planted(200, axis = 3, spread = 2f)
    val rows = Pca.topComponent(df, "vec_id", "embedding", iters = 2)
      .orderBy("dim").collect()
    val loadings = rows.map(r => math.abs(r.getAs[Long]("pc1_x1e6")))
    assert(loadings(3) == loadings.max, "dominant axis must carry the max loading")
    assert(loadings(3) == 1000000L, "L-inf normalization pins the max to 1e6")
    // noise axes stay an order of magnitude below
    for (d <- 0 until 8 if d != 3)
      assert(loadings(d) < 300000L, s"axis $d loading ${loadings(d)} too high")
  }

  test("partitioning independence: 1 vs 13 partitions, byte-identical") {
    val df = planted(150, axis = 5, spread = 1.5f)
    val a = Pca.topComponent(df.coalesce(1), "vec_id", "embedding")
      .orderBy("dim").collect().toSeq
    val b = Pca.topComponent(df.repartition(13), "vec_id", "embedding")
      .orderBy("dim").collect().toSeq
    assert(a == b)
  }

  test("centering contract: a constant shift of every vector moves nothing") {
    val df = planted(100, axis = 2, spread = 1f)
    val shifted = df.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    val a = Pca.topComponent(df, "vec_id", "embedding")
      .orderBy("dim").collect().toSeq
    val b = Pca.topComponent(shifted, "vec_id", "embedding")
      .orderBy("dim").collect().toSeq
    assert(a == b, "centered Gram must absorb a constant shift")
  }
}
