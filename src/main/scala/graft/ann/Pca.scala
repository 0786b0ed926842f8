package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed PCA, first principal component by power iteration — the
  * embedding-prep step the similarity stack reaches for next (centering
  * + dominant-direction removal sharpens cosine neighborhoods before
  * SemDedup/ANN; the "all-but-the-top" observation of the public
  * sentence-embedding literature):
  *
  *  - **Centering without division**: components milli-quantize
  *    (floor 1000·x, the VectorPrep discipline), then center by CROSS
  *    MULTIPLICATION — c_i = n·m_i − Σm_i — so the centered values stay
  *    exact integers (no mean rounding on any engine).
  *  - **Gram aggregation**: G = Σ_v c·cᵀ via a vid-co-partitioned
  *    self-join of the exploded component frame. The d² blowup is
  *    MAP-LOCAL: the (j, k) groupBy's map-side combine caps what
  *    crosses the wire at d²·partitions rows — the classical
  *    distributed-Gram shape (d = 64 → 4096 cells, a broadcastable
  *    frame forever after).
  *  - **Power iteration, exact**: v₀ = 1; w = G·v as DECIMAL(38,0)
  *    products; re-normalize by the L∞ norm with the subtract-pmod
  *    floor (floor(10⁶·w/max|w|) — identical on both engines for
  *    either sign). A fixed iteration count keeps the plan static and
  *    the oracle an unrolled replay (the q65 two-Lloyd-step precedent).
  *  - **Rayleigh quotient** floor(vᵀGv / vᵀv) rides along as the
  *    eigenvalue gauge (DECIMAL(38,0) — it scales with n³·10⁶).
  *
  * Sign is determined (v₀ = 1 fixes the orientation); ties and
  * rounding are exact, so the loadings are byte-identical across
  * partitionings and engines.
  */
object Pca {

  private val Dec38 = DecimalType(38, 0)

  /** One row per dimension: dim, pc1_x1e6 (L∞-normalized loading after
    * `iters` power steps), rayleigh (floor(vᵀGv/vᵀv), repeated).
    */
  def topComponent(embeddings: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2): DataFrame = {
    val el = embeddings.select(col(idCol).as("vid"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1000).cast("long")))
        .as(Seq("j", "x")))
    val st = el.groupBy(col("j")).agg(
      sum(col("x")).as("sj"), count(lit(1)).as("n"))
    val ce = el.join(broadcast(st), Seq("j"))
      .select(col("vid"), col("j"),
        (col("x") * col("n") - col("sj")).as("c"))
    val cb = ce.select(col("vid"), col("j").as("k"), col("c").as("cb"))
    val g = ce.join(cb, Seq("vid"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("c").cast(Dec38) * col("cb")).as("g"))
      .localCheckpoint(true) // d² rows; every iteration reuses it
    var v: DataFrame = g.select(col("k")).distinct()
      .select(col("k"), lit(1L).as("v"))
    var t = 0
    while (t < iters) {
      val w = g.join(broadcast(v), Seq("k"))
        .groupBy(col("j")).agg(sum(col("g") * col("v")).as("w"))
      val mx = w.agg(greatest(max(abs(col("w"))), lit(1).cast(Dec38))
        .as("mx"))
      v = w.crossJoin(broadcast(mx))
        .select(col("j").as("k"),
          ((col("w") * 1000000L - pmod(col("w") * 1000000L, col("mx"))) /
            col("mx")).cast("long").as("v"))
      t += 1
    }
    val va = v.select(col("k").as("j"), col("v").as("va"))
    val vb = v.select(col("k"), col("v").as("vb"))
    val ray = g.join(broadcast(va), Seq("j")).join(broadcast(vb), Seq("k"))
      .agg(sum(col("g") * col("va") * col("vb")).as("num"))
      .crossJoin(v.agg(sum(col("v").cast(Dec38) * col("v")).as("den")))
      .select(((col("num") - pmod(col("num"), col("den"))) / col("den"))
        .cast(Dec38).as("rayleigh"))
    v.select(col("k").cast("long").as("dim"), col("v").as("pc1_x1e6"))
      .crossJoin(broadcast(ray))
  }
}
