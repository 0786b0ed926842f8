package graft

import graft.ann.Pca
import org.apache.spark.sql.functions._

/** Pca laws the q164/q165/q166 oracles can't isolate: planted
  * anisotropy recovery, partitioning independence, the centering
  * contract (a constant shift moves nothing), the removeTop transform
  * actually erasing the dominant direction, and deflation recovering a
  * second orthogonal axis.
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

  /** Two planted orthogonal strong axes with distinct spreads (axisA
    * dominates), dyadic like [[planted]].
    */
  private def planted2(n: Int, axisA: Int, spreadA: Float, axisB: Int,
      spreadB: Float) =
    (0 until n).map { i =>
      val h = graft.functions.Hashing.murmur64(i.toLong)
      val v = Array.tabulate(8) { d =>
        val noise = (((h >>> (4 * d)) & 15L) - 8L).toFloat / 16f
        if (d == axisA) (if (i % 2 == 0) spreadA else -spreadA) + noise
        else if (d == axisB)
          (if ((i / 2) % 2 == 0) spreadB else -spreadB) + noise
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
    // d = floor(mx/1e6)+1 normalization lands the max strictly below 1e6
    // but within a part per thousand of it once the Gram is large
    assert(loadings(3) > 995000L && loadings(3) < 1000000L,
      s"L-inf normalization should pin the max near 1e6, got ${loadings(3)}")
    // noise axes stay an order of magnitude below
    for (d <- 0 until 8 if d != 3)
      assert(loadings(d) < 300000L, s"axis $d loading ${loadings(d)} too high")
    val ray = rows.map(_.getAs[Long]("rayleigh")).distinct
    assert(ray.length == 1 && ray.head > 0L,
      "rayleigh gauge must be a positive per-run constant")
  }

  test("every output value stays a 63-bit signed long (BIGINT-only contract)") {
    val df = planted(300, axis = 1, spread = 2.5f)
    val rows = Pca.topComponent(df, "vec_id", "embedding", iters = 2).collect()
    // schema itself is the contract: LongType everywhere, no decimals
    assert(rows.head.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType),
      "q164 output must be BIGINT-only after the r17 redesign")
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

  test("degenerate corpus (all vectors identical) yields zero loadings, no division error") {
    val df = (0 until 40).map(i => (i.toLong, Array.fill(8)(0.25f)))
      .toDF("vec_id", "embedding")
    val rows = Pca.topComponent(df, "vec_id", "embedding").collect()
    assert(rows.forall(_.getAs[Long]("pc1_x1e6") == 0L))
    assert(rows.forall(_.getAs[Long]("rayleigh") == 0L))
  }

  test("removeTop erases the dominant direction: dot_after collapses vs dot_before") {
    val df = planted(200, axis = 3, spread = 2f)
    val comp = Pca.topComponent(df, "vec_id", "embedding", iters = 2)
    val sharp = Pca.removeTop(df, "vec_id", "embedding", comp)
    val vArr = comp.orderBy("dim").collect().map(_.getAs[Long]("pc1_x1e6"))
    val audit = sharp.select(col("vec_id"), col("dot_v"),
      aggregate(zip_with(col("sharp"), array(vArr.map(lit): _*),
        (a, b) => a * b), lit(0L), (acc, x) => acc + x).as("dot_after"))
      .agg(max(abs(col("dot_v"))).as("mb"),
        max(abs(col("dot_after"))).as("ma"))
      .collect().head
    val (before, after) = (audit.getAs[Long]("mb"), audit.getAs[Long]("ma"))
    assert(before > 1000000L, s"planted axis must dominate dots, got $before")
    // the floor in the projection leaves < one unit per dimension: the
    // residual dot is bounded by d·max|v| ≪ the planted signal
    assert(after < before / 100,
      s"sharpened dots must collapse: before=$before after=$after")
  }

  test("removeTop of a zero component is the milli identity") {
    val df = planted(50, axis = 0, spread = 1f)
    val zero = (0 until 8).map(d => (d.toLong, 0L))
      .toDF("dim", "pc1_x1e6")
    val sharp = Pca.removeTop(df, "vec_id", "embedding", zero)
    val m = df.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * 1000).cast("long")).as("m"))
    assert(sharp.select(col("vec_id"), col("sharp").as("m"))
      .exceptAll(m).isEmpty, "zero component must sharpen to m itself")
  }

  test("deflation recovers both planted axes in spread order") {
    val df = planted2(240, axisA = 2, spreadA = 3f, axisB = 6, spreadB = 1.5f)
    val comps = Pca.topComponents(df, "vec_id", "embedding",
      nComponents = 2, iters = 3)
    val c1 = comps.where(col("comp") === 1).orderBy("dim").collect()
      .map(r => math.abs(r.getAs[Long]("loading_x1e6")))
    val c2 = comps.where(col("comp") === 2).orderBy("dim").collect()
      .map(r => math.abs(r.getAs[Long]("loading_x1e6")))
    assert(c1(2) == c1.max, "comp 1 must find the wider axis")
    assert(c2(6) == c2.max, "comp 2 must find the second axis after deflation")
    assert(c2(2) < 300000L,
      s"deflation must suppress the first axis in comp 2, got ${c2(2)}")
    val r1 = comps.where(col("comp") === 1).select("rayleigh").head.getLong(0)
    val r2 = comps.where(col("comp") === 2).select("rayleigh").head.getLong(0)
    assert(r1 > r2 && r2 >= 0L, s"gauges must order with spread: $r1 vs $r2")
  }

  test("topComponents(1) matches topComponent") {
    val df = planted(120, axis = 4, spread = 2f)
    val one = Pca.topComponents(df, "vec_id", "embedding", nComponents = 1)
      .select(col("dim"), col("loading_x1e6").as("pc1_x1e6"), col("rayleigh"))
      .orderBy("dim").collect().toSeq
    val top = Pca.topComponent(df, "vec_id", "embedding")
      .orderBy("dim").collect().toSeq
    assert(one == top)
  }
}
