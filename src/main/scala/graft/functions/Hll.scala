package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, the
  * public-domain construction) — the third leg of graft's sketch trio
  * (Count-Min heavy hitters q53, KMV set algebra q127): per-group
  * cardinality estimates whose state is 64 registers, merged by MAX —
  * the order-independent, shuffle-friendly shape a 100 TB vocabulary
  * census needs (exact distinct is the operator you run a sketch to
  * avoid).
  *
  * Determinism discipline (every step exact integer, engine-portable —
  * no IEEE ln/pow anywhere):
  *
  *  - item hash h = [[Hashing.hash64]] (FNV-1a + splitmix64); the
  *    DuckDB oracle replays it per character, the established q17/q31
  *    route.
  *  - register = h & 63 (m = 64 registers, p = 6); the remaining 58
  *    bits w = h >>> 6 contribute ρ = trailing zeros of w, + 1, CAPPED
  *    at 32 (w == 0 → 32). The cap bounds every downstream term to
  *    exact BIGINT range and biases nothing until ~2^32 distinct items
  *    land in one register's slice (≫ any per-group vocabulary).
  *    Trailing zeros are pure bit algebra — bit_count((w & -w) - 1) —
  *    identical on both engines; the classical leading-zero ρ needs a
  *    clz primitive neither engine's integer SQL has.
  *  - register value M = MAX(ρ) — duplicates cannot move a max, which
  *    IS the HLL property (no distinct pass before the sketch).
  *  - the harmonic denominator is held EXACT: S = Σ_reg 2^(32 − M)
  *    with absent registers contributing 2^32 (M = 0); S ≤ 64·2^32 =
  *    2^38 fits BIGINT.
  *  - estimate = floor(α·m²/Σ2^(−M)) = floor(α₄ · 4096 · 2^32 /
  *    (10⁴ · S)) with α₄ = 7093 — α₆₄ = 0.7213/(1 + 1.079/64) ≈
  *    0.70930 fixed BY FIAT at 4 decimals so the arithmetic stays
  *    integer; numerator 7093·4096·2^32 ≈ 1.25e17 < 2^63. Both engines
  *    compute the same floor division.
  *  - the small-range (linear counting) correction m·ln(m/V) needs ln,
  *    but V ranges over just {1..64} — so the 64 possible values are
  *    precomputed ONCE on the driver ([[LinearTable]]) and embedded as
  *    integer literals in both plans; `estimate` applies the standard
  *    HLL selection rule (E ≤ 2.5m and V > 0 → linear counting) with
  *    zero per-row transcendentals.
  *
  * Scale shape: one (group, reg) shuffle with map-side partial MAX
  * (the combiner does almost all the work — ≤64 rows per group reach
  * the reduce side), then a 64-row-per-group fold. The optional exact
  * audit column is a separate aggregate the caller can drop at scale.
  */
object Hll {

  val NumRegisters = 64
  private val RhoCap = 32
  /** α₆₄ at fixed 4-decimal precision (by fiat, see object doc). */
  private val AlphaE4 = 7093L
  /** α₄ · m² · 2^32 — the exact integer numerator of the estimator. */
  val EstNumerator: Long = (AlphaE4 * 4096L) << 32

  /** floor(m·ln(m/V)) for V = 1..64 — the full domain of the linear-
    * counting correction, fixed on the driver so neither engine
    * evaluates ln at run time (index V-1).
    */
  val LinearTable: IndexedSeq[Long] =
    (1 to NumRegisters).map(v =>
      math.floor(NumRegisters * math.log(NumRegisters.toDouble / v)).toLong)

  /** 2.5·m — the classical harmonic-vs-linear switch threshold. */
  val SmallRange: Long = 5L * NumRegisters / 2

  /** ρ column: trailing zeros of (h >>> 6) plus one, capped at 32;
    * reads the `hll_rest` column of the enclosing select.
    */
  private def rho: Column =
    when(col("hll_rest") === 0L, lit(RhoCap))
      .otherwise(least(
        expr("bit_count((hll_rest & -hll_rest) - 1) + 1"), lit(RhoCap)))

  /** Per-group HLL report over pre-hashed items: one row per group with
    * `v_zero` (registers never hit), `s_harmonic` (the exact harmonic
    * denominator ×2^32), and `est_hll` (the floor estimate). `hashCol`
    * must be a 64-bit hash column (e.g. [[F.hash64]] of the item).
    */
  def sketch(items: DataFrame, groupCols: Seq[String], hashCol: String)
      : DataFrame = {
    val gs = groupCols.map(col)
    val regs = items
      .select(gs :+ col(hashCol).bitwiseAND(lit(63L)).as("hll_reg")
        :+ shiftrightunsigned(col(hashCol), 6).as("hll_rest"): _*)
      .select(gs :+ col("hll_reg") :+ rho.as("hll_rho"): _*)
      .groupBy(gs :+ col("hll_reg"): _*)
      .agg(max(col("hll_rho")).as("hll_m"))
    regs.groupBy(gs: _*)
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 32 - hll_m)")).as("hll_sp"),
        count(lit(1)).as("hll_np"))
      .select(gs
        :+ (lit(NumRegisters.toLong) - col("hll_np")).as("v_zero")
        :+ (col("hll_sp") +
          (lit(NumRegisters.toLong) - col("hll_np")) * lit(1L << 32))
          .as("s_harmonic"): _*)
      .withColumn("est_hll",
        expr(s"${EstNumerator}L div (10000L * s_harmonic)"))
      .withColumn("estimate",
        when(col("est_hll") <= SmallRange && col("v_zero") > 0L,
          element_at(
            array(LinearTable.map(lit): _*), col("v_zero").cast("int")))
          .otherwise(col("est_hll")))
  }
}
