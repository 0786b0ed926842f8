package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA by exact power iteration — the embedding-prep step
  * the similarity stack reaches for next (centering + dominant-direction
  * removal sharpens cosine neighborhoods before SemDedup/ANN; the
  * "all-but-the-top" observation of the public sentence-embedding
  * literature).
  *
  * Arithmetic discipline (VERDICT r16 task 1 — the q127 r14 remedy):
  * EVERY intermediate is a 63-bit SIGNED BIGINT. The r16 version held
  * the Gram in DECIMAL(38,0) and the oracle leaned on HUGEINT `%`/`//`,
  * the exact surface whose cross-version DuckDB semantics produced the
  * r13 q127 and r16 q164 red rows. Staged rescaling keeps both engines
  * on BIGINT-only operators:
  *
  *  - **Centering without division**: components milli-quantize
  *    (floor 1000·x), center by cross multiplication c = n·m − Σm
  *    (exact — no mean rounding), then return to milli units with one
  *    exact floor cq = ⌊c/n⌋, so |cq| ≤ 2·1024+1 regardless of n.
  *  - **Gram aggregation**: G = Σ_v cq·cqᵀ via a vid-co-partitioned
  *    self-join of the exploded component frame. The d² blowup is
  *    MAP-LOCAL (the (j,k) groupBy's map-side combine caps the shuffle
  *    at d²·partitions rows). |G| ≤ 4.2·10⁶·n — BIGINT-exact up to
  *    n < 2·10¹² vectors (documented bound; a 100 TB corpus of 10¹¹
  *    embeddings sits inside it).
  *  - **Gram normalization**: gdiv = ⌊max|G|/10⁹⌋ + 1, gs = ⌊G/gdiv⌋
  *    caps every Gram cell at ~10⁹ so all later products stay ≪ 2⁶³
  *    (the divisor's +1 makes the degenerate all-zero Gram safe with
  *    no special case).
  *  - **Power iteration, exact**: v₀ = 1; w = gs·v (≤ 64·2·10⁹·10⁶ ≈
  *    1.3·10¹⁷); renormalize by d = ⌊max|w|/10⁶⌋ + 1, v' = ⌊w/d⌋ —
  *    strictly < 10⁶ in magnitude, no clamp, monotone, and identical
  *    on both engines via the subtract-pmod floor. A fixed iteration
  *    count keeps the plan static and the oracle an unrolled replay
  *    (the q65 two-Lloyd-step precedent).
  *  - **Rayleigh gauge** rides along as the eigenvalue estimate IN
  *    GRAM-SCALE UNITS (λ/gdiv): rs = ⌊(gs·v)/10⁶⌋, vs = ⌊v/10³⌋,
  *    rayleigh = ⌊Σ rs·vs / max(Σ vs², 1)⌋ ≈ vᵀ gs v / vᵀv (the
  *    ADVICE r16 zero-denominator guard is the greatest(…, 1)).
  *
  * Sign is determined (v₀ = 1 fixes the orientation); every floor is
  * the subtract-pmod form, so loadings are byte-identical across
  * partitionings and engines.
  */
object Pca {

  /** Loading scale: the reported component is L∞-normalized to ~10⁶. */
  private val LoadScale = 1000000L
  /** Gram cells rescale to at most ~10⁹ before iteration. */
  private val GramScale = 1000000000L
  /** Constant post-deflation divisor (= max supported dims): keeps the
    * deflated-Gram magnitude a stable fixed point (see topComponents).
    */
  private val DeflateDiv = 64L

  /** Exact floor(a/b) for BIGINT columns, b > 0: subtract-pmod makes the
    * numerator exactly divisible, so the integral `div` (truncating) and
    * a true floor agree — and nothing routes through a double.
    */
  private[ann] def fdiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** Milli-quantized exploded component frame: (vid, j, x). */
  private def milliExploded(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    embeddings.select(col(idCol).as("vid"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1000).cast("long")))
        .as(Seq("j", "x")))

  /** The normalized Gram (j, k, g) with |g| capped at ~[[GramScale]]:
    * center exactly (cross-multiplied, then one floor back to milli
    * units), aggregate the map-local d² products, rescale.
    */
  private def scaledGram(el: DataFrame): DataFrame = {
    val st = el.groupBy(col("j")).agg(
      sum(col("x")).as("sj"), count(lit(1)).as("n"))
    val ce = el.join(broadcast(st), Seq("j"))
      .select(col("vid"), col("j"),
        fdiv(col("x") * col("n") - col("sj"), col("n")).as("c"))
    val cb = ce.select(col("vid"), col("j").as("k"), col("c").as("cb"))
    val graw = ce.join(cb, Seq("vid"))
      .groupBy(col("j"), col("k"))
      .agg(sum(col("c") * col("cb")).as("g0"))
    rescaleGram(graw.select(col("j"), col("k"), col("g0")))
  }

  /** gdiv = ⌊max|g0|/10⁹⌋ + 1; g = ⌊g0/gdiv⌋ — one bounded aggregate
    * broadcast back onto the d² frame, checkpointed because every
    * iteration reuses it.
    */
  private def rescaleGram(graw: DataFrame): DataFrame = {
    val gmax = graw.agg(max(abs(col("g0"))).as("gm"))
      .select((fdiv(col("gm"), lit(GramScale)) + 1L).as("gdiv"))
    graw.crossJoin(broadcast(gmax))
      .select(col("j"), col("k"), fdiv(col("g0"), col("gdiv")).as("g"))
      .localCheckpoint(true) // d² rows; every iteration reuses it
  }

  /** `iters` exact power steps from v₀ = 1 over the normalized Gram:
    * returns (k, v) with |v| < 10⁶.
    */
  private def powerLoop(g: DataFrame, iters: Int): DataFrame = {
    var v: DataFrame = g.select(col("k")).distinct()
      .select(col("k"), lit(1L).as("v"))
    var t = 0
    while (t < iters) {
      val w = g.join(broadcast(v), Seq("k"))
        .groupBy(col("j")).agg(sum(col("g") * col("v")).as("w"))
      val dv = w.agg(max(abs(col("w"))).as("mx"))
        .select((fdiv(col("mx"), lit(LoadScale)) + 1L).as("d"))
      v = w.crossJoin(broadcast(dv))
        .select(col("j").as("k"), fdiv(col("w"), col("d")).as("v"))
      t += 1
    }
    v
  }

  /** One-row (rayleigh) gauge of the component over the normalized
    * Gram — λ ≈ vᵀGv/vᵀv in the CURRENT Gram's cell units: num =
    * Σ ⌊(Gv)_j/10⁶⌋·⌊v_j/10³⌋ ≈ vᵀGv/10⁹ (≤ 8.2·10¹⁵), den =
    * Σ ⌊v/10³⌋² ≈ vᵀv/10⁶ (≤ 6.4·10⁷), λ = ⌊num/max(⌊den/10³⌋, 1)⌋ —
    * the 10⁹/10⁹ staging cancels, every product < 2⁶³, and the
    * degenerate all-zero v divides by the guarded 1 (ADVICE r16).
    */
  private def rayleighOf(g: DataFrame, v: DataFrame): DataFrame = {
    val va = v.select(col("k").as("j"), col("v").as("va"))
    val num = g.join(broadcast(v.select(col("k"), col("v").as("vb"))),
        Seq("k"))
      .groupBy(col("j")).agg(sum(col("g") * col("vb")).as("r"))
      .join(broadcast(va), Seq("j"))
      .agg(sum(fdiv(col("r"), lit(LoadScale)) *
        fdiv(col("va"), lit(1000L))).as("num"))
    val den = v.agg(greatest(fdiv(sum(fdiv(col("v"), lit(1000L)) *
      fdiv(col("v"), lit(1000L))), lit(1000L)), lit(1L)).as("den"))
    num.crossJoin(den)
      .select(fdiv(col("num"), col("den")).as("rayleigh"))
  }

  /** One row per dimension: dim, pc1_x1e6 (L∞-normalized loading after
    * `iters` power steps, strictly < 10⁶), rayleigh (the Gram-scale
    * eigenvalue gauge, repeated). All BIGINT.
    */
  def topComponent(embeddings: DataFrame, idCol: String, vecCol: String,
      iters: Int = 2): DataFrame = {
    val g = scaledGram(milliExploded(embeddings, idCol, vecCol))
    // checkpoint v (d rows — the topComponents posture, r20): the lazy
    // power-loop subtree appears FOUR times in the returned plan (the
    // loading projection, both rayleigh joins, the norm denominator) —
    // plus once more per consumer that collects the loadings
    // (removeTop/removeTopAudit) — and each appearance re-ran the full
    // iters×(join+agg+crossJoin) stage chain against the Gram
    val v = powerLoop(g, iters).localCheckpoint(true)
    v.select(col("k").cast("long").as("dim"), col("v").as("pc1_x1e6"))
      .crossJoin(broadcast(rayleighOf(g, v)))
  }

  /** Top `nComponents` principal directions by power iteration +
    * Hotelling deflation, all in the staged BIGINT discipline: after
    * each component, subtract λ·v vᵀ/(vᵀv) from the Gram —
    * term_jk = ⌊λ·⌊p_jk/10³⌋/10⁶⌋ with p_jk = ⌊v_j·v_k /
    * (⌊vᵀv/10⁹⌋+1)⌋ the 10⁹-scaled projector cell — then divide the
    * deflated Gram by the CONSTANT [[DeflateDiv]] = 64 before the next
    * iteration. The constant divisor keeps every bound unconditional
    * (|g_{c+1}| ≤ (|g_c| + tr)/64 is a stable ≲ 2·10⁹ fixed point, so
    * every power product stays ≪ 2⁶³ at any component count) and —
    * unlike a data-dependent re-gdiv — makes the per-round eigenvalue
    * gauges comparable: the reported `rayleigh` is the round gauge
    * ×64^(c−1), i.e. every component's λ in the FIRST round's Gram
    * units (precision fades ~64× per round; 2–4 components is the
    * sensible range). Output: one row per (comp, dim) with comp
    * 1-based, loading_x1e6, rayleigh.
    *
    * The deflation loop is driver-side over nComponents (≤ d, tiny);
    * each round touches only the d²-row Gram frame.
    */
  def topComponents(embeddings: DataFrame, idCol: String, vecCol: String,
      nComponents: Int = 2, iters: Int = 2): DataFrame = {
    require(nComponents >= 1, s"nComponents must be >= 1, got $nComponents")
    // rayleigh (≲ 10¹¹) × 64^(c−1) overflows Long near c = 10 and the
    // per-round gauge has faded to noise well before that (ADVICE r17):
    // make the documented 2–4 component range a hard ≤ 6 contract
    // instead of returning garbage gauges
    require(nComponents <= 6,
      s"nComponents must be <= 6 (the 64^(c-1) gauge re-scale overflows " +
        s"and precision fades ~64x per round), got $nComponents")
    var g = scaledGram(milliExploded(embeddings, idCol, vecCol))
    var out: DataFrame = null
    var c = 1
    var scaleBack = 1L // 64^(c-1): round-gauge → first-round units
    while (c <= nComponents) {
      val v = powerLoop(g, iters).localCheckpoint(true) // d rows
      val ray = rayleighOf(g, v).localCheckpoint(true)  // 1 row
      val comp = v.select(lit(c.toLong).as("comp"),
        col("k").cast("long").as("dim"), col("v").as("loading_x1e6"))
        .crossJoin(broadcast(ray.select(
          (col("rayleigh") * scaleBack).as("rayleigh"))))
      out = if (out == null) comp else out.union(comp)
      if (c < nComponents) {
        val pdiv = v.agg(sum(col("v") * col("v")).as("vv"))
          .select((fdiv(col("vv"), lit(GramScale)) + 1L).as("pdiv"))
        val proj = v.select(col("k").as("j"), col("v").as("va"))
          .crossJoin(v.select(col("k"), col("v").as("vb")))
          .crossJoin(broadcast(pdiv))
          .select(col("j"), col("k"),
            fdiv(col("va") * col("vb"), col("pdiv")).as("p"))
        g = g.join(proj, Seq("j", "k"))
          .crossJoin(broadcast(ray))
          .select(col("j"), col("k"),
            fdiv(col("g") - fdiv(col("rayleigh") *
              fdiv(col("p"), lit(1000L)), lit(1000000L)),
              lit(DeflateDiv)).as("g"))
          .localCheckpoint(true) // d² rows
        scaleBack *= DeflateDiv
      }
      c += 1
    }
    out
  }

  /** The "all-but-the-top" TRANSFORM itself (VERDICT r16 next-task 6 —
    * what [[topComponent]]'s output is FOR): sharpen every embedding by
    * projecting the dominant direction out, x ← x − (⟨x,v⟩/⟨v,v⟩)·v,
    * in exact milli-unit integers. `component` is [[topComponent]]'s
    * (dim, pc1_x1e6, …) frame; its ≤ d rows COLLECT to the driver (the
    * SemDedup-codebook posture — bounded by the dimensionality, never
    * by data) and re-enter the plan as literals, so the transform is
    * ONE map-side pass of codegen array lambdas — zero shuffles, the
    * right 100 TB shape.
    *
    * Magnitude proof: |m| ≤ 1024 (milli components), |v_j| < 10⁶,
    * vᵀv ≥ max v², so |⌊dot·v_j/vᵀv⌋| ≤ |dot|/max|v| ≤ 64·1024 — every
    * product ≤ 64·1024·10⁶·10⁶ ≪ 2⁶³ and sharpened components stay
    * < 2¹⁷ in milli units.
    *
    * Output: (idCol, sharp array<long> — sharpened milli components,
    * dot_v — the pre-removal ⟨m,v⟩, the hub-ness gauge).
    */
  def removeTop(embeddings: DataFrame, idCol: String, vecCol: String,
      component: DataFrame, loadCol: String = "pc1_x1e6"): DataFrame =
    sharpened(milli(embeddings, idCol, vecCol), idCol,
      loadings(component, loadCol))
      .select(col(idCol), col("sharp"), col("dot_v"))

  /** [[removeTop]] with its before/after audit — what the q165 oracle
    * checks end-to-end: dot_before/dot_after (⟨·,v⟩ of the raw and
    * sharpened milli vectors — after is the floor residual, < d per
    * max|v| unit) and n2_before/n2_after (milli squared norms; the drop
    * is the variance the dominant direction carried).
    */
  def removeTopAudit(embeddings: DataFrame, idCol: String, vecCol: String,
      component: DataFrame, loadCol: String = "pc1_x1e6"): DataFrame = {
    val vArr = loadings(component, loadCol)
    val vLit = array(vArr.map(lit): _*)
    val sq = (a: Column) => aggregate(transform(a, x => x * x),
      lit(0L), (acc, x) => acc + x)
    val dotV = (a: Column) => aggregate(zip_with(a, vLit, (x, b) => x * b),
      lit(0L), (acc, x) => acc + x)
    sharpened(milli(embeddings, idCol, vecCol), idCol, vArr)
      .select(col(idCol), col("dot_v").as("dot_before"),
        dotV(col("sharp")).as("dot_after"),
        sq(col("m")).as("n2_before"), sq(col("sharp")).as("n2_after"))
  }

  /** Collect the ≤ d component loadings to the driver (bounded by the
    * dimensionality, never by data — the SemDedup-codebook posture).
    */
  private def loadings(component: DataFrame, loadCol: String): Array[Long] = {
    val vArr: Array[Long] = component.select(col("dim"), col(loadCol))
      .orderBy("dim").collect().map(_.getLong(1))
    require(vArr.nonEmpty, "component frame is empty")
    vArr
  }

  private def milli(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    embeddings.select(col(idCol), transform(col(vecCol),
      x => floor(x.cast("double") * 1000).cast("long")).as("m"))

  /** The milli-quantized vectors (idCol, m) — public so consumers that
    * A/B raw-vs-sharpened signatures (q177) project BOTH arms from the
    * same exact integer domain.
    */
  def milliVectors(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = milli(embeddings, idCol, vecCol)

  /** (idCol, m milli array, sharp sharpened array, dot_v) — the shared
    * one-pass body of [[removeTop]]/[[removeTopAudit]].
    */
  private def sharpened(milliDf: DataFrame, idCol: String,
      vArr: Array[Long]): DataFrame = {
    val vv = math.max(vArr.map(x => x * x).sum, 1L)
    val vLit = array(vArr.map(lit): _*)
    milliDf
      .withColumn("dot_v", aggregate(
        zip_with(col("m"), vLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .select(col(idCol), col("m"),
        zip_with(col("m"), vLit,
          (m, vj) => m - fdiv(col("dot_v") * vj, lit(vv))).as("sharp"),
        col("dot_v"))
  }
}
