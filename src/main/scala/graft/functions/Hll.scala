package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, the
  * public-domain construction) — the third leg of graft's sketch trio
  * (Count-Min heavy hitters q53, KMV set algebra q127): per-group
  * cardinality estimates whose state is 2^p max-merged registers —
  * the order-independent, shuffle-friendly shape a 100 TB vocabulary
  * census needs (exact distinct is the operator you run a sketch to
  * avoid).
  *
  * Precision is a PARAMETER now (VERDICT r16 next-task 7): p = 6
  * (64 registers, ~13% relative error — the cheap gauge, and the
  * byte-stable q159 contract) up to p = 14 (16384 registers, ~0.8% —
  * a real vocabulary census). The integer discipline generalizes:
  *
  *  - item hash h = [[Hashing.hash64]] (FNV-1a + splitmix64); the
  *    DuckDB oracle replays it per character, the established q17/q31
  *    route.
  *  - register = h & (2^p − 1); the remaining 64−p bits w = h >>> p
  *    contribute ρ = trailing zeros of w, + 1, CAPPED at
  *    C(p) = min(32, 50 − 2p). The cap bounds every downstream term
  *    to exact BIGINT range — αE4·m²·2^C ≤ 7213·2^50 < 2⁶³ for every
  *    p ≤ 14 — and biases nothing until ~2^C distinct items land in
  *    one register's slice (2^(C+p) ≥ 2^36 corpus distincts; ≫ any
  *    vocabulary). Trailing zeros are pure bit algebra —
  *    bit_count((w & -w) - 1) — identical on both engines; the
  *    classical leading-zero ρ needs a clz primitive neither engine's
  *    integer SQL has. At p = 6, C = 32: bit-identical to the r16
  *    sketch.
  *  - register value M = MAX(ρ) — duplicates cannot move a max, which
  *    IS the HLL property (no distinct pass before the sketch).
  *  - the harmonic denominator is held EXACT: S = Σ_reg 2^(C − M)
  *    with absent registers contributing 2^C (M = 0); S ≤ m·2^C ≤
  *    2^41 fits BIGINT.
  *  - estimate = floor(α·m²·2^C / (10⁴·S)) with α at fixed 4-decimal
  *    precision BY FIAT (α₆₄ = 7093 — the frozen q159 constant; for
  *    p ≥ 7, ⌊10⁴·0.7213/(1 + 1.079/m)⌋ — a driver-side constant per
  *    p, never a run-time transcendental). Both engines compute the
  *    same floor division.
  *  - the small-range (linear counting) correction m·ln(m/V) needs ln,
  *    but V ranges over just {1..m} — so the 2^p possible values are
  *    precomputed ONCE on the driver ([[linearTable]], ≤ 16384
  *    driver-bounded literals) and embedded in both plans; `estimate`
  *    applies the standard HLL selection rule (E ≤ 2.5m and V > 0 →
  *    linear counting) with zero per-row transcendentals.
  *
  * Scale shape: one (group, reg) shuffle with map-side partial MAX
  * (the combiner does almost all the work — ≤ 2^p rows per group reach
  * the reduce side), then a 2^p-row-per-group fold. The optional exact
  * audit column is a separate aggregate the caller can drop at scale.
  */
object Hll {

  /** The supported precision window: ≥ 4 keeps the register file a
    * real sketch, ≤ 14 keeps αE4·m²·2^C < 2⁶³ and the linear-counting
    * table driver-bounded.
    */
  val MinP = 4
  val MaxP = 14

  /** Registers at precision p. */
  def registers(p: Int): Int = { requireP(p); 1 << p }

  /** The ρ cap C(p) = min(32, 50 − 2p) — see the object doc. */
  def rhoCap(p: Int): Int = { requireP(p); math.min(32, 50 - 2 * p) }

  /** α at fixed 4-decimal precision, by fiat: the frozen 7093 at p = 6
    * (the q159 byte-stability contract), ⌊10⁴·0.7213/(1 + 1.079/m)⌋
    * above (the standard large-m constant; p ∈ {4,5} use the classical
    * 0.673/0.697 small-m constants).
    */
  def alphaE4(p: Int): Long = {
    requireP(p)
    p match {
      case 4 => 6730L
      case 5 => 6970L
      case 6 => 7093L
      case _ =>
        math.floor(10000.0 * 0.7213 / (1.0 + 1.079 / (1 << p))).toLong
    }
  }

  /** α₄·m²·2^C — the exact integer numerator of the estimator
    * (< 7213·2^50 for every supported p).
    */
  def estNumerator(p: Int): Long =
    alphaE4(p) * (1L << (2 * p)) * (1L << rhoCap(p))

  /** floor(m·ln(m/V)) for V = 1..m — the full domain of the linear-
    * counting correction, fixed on the driver so neither engine
    * evaluates ln at run time (index V-1). ≤ 2^14 entries —
    * driver-bounded by the precision, never by data.
    */
  def linearTable(p: Int): IndexedSeq[Long] = {
    val m = registers(p)
    (1 to m).map(v => math.floor(m * math.log(m.toDouble / v)).toLong)
  }

  /** 2.5·m — the classical harmonic-vs-linear switch threshold. */
  def smallRange(p: Int): Long = 5L * registers(p) / 2

  private def requireP(p: Int): Unit =
    require(p >= MinP && p <= MaxP, s"precision p must be in [$MinP, $MaxP], got $p")

  // ---- the frozen p = 6 surface (q159 / StreamHll byte contract) ----

  val NumRegisters = 64
  /** α₆₄ at fixed 4-decimal precision (by fiat, see object doc). */
  private val AlphaE4 = 7093L
  /** α₄ · m² · 2^32 — the exact integer numerator of the estimator. */
  val EstNumerator: Long = (AlphaE4 * 4096L) << 32
  /** floor(64·ln(64/V)) for V = 1..64. */
  val LinearTable: IndexedSeq[Long] = linearTable(6)
  /** 2.5·64. */
  val SmallRange: Long = smallRange(6)

  /** ρ column at precision p: trailing zeros of (h >>> p) plus one,
    * capped at C(p); reads the `hll_rest` column of the enclosing
    * select.
    */
  private def rho(p: Int): Column = {
    val cap = rhoCap(p)
    when(col("hll_rest") === 0L, lit(cap.toLong))
      .otherwise(least(
        expr("bit_count((hll_rest & -hll_rest) - 1) + 1"),
        lit(cap.toLong)))
  }

  /** Per-group HLL report over pre-hashed items: one row per group with
    * `v_zero` (registers never hit), `s_harmonic` (the exact harmonic
    * denominator ×2^C), and `est_hll` (the floor estimate). `hashCol`
    * must be a 64-bit hash column (e.g. [[F.hash64]] of the item).
    * p = 6 reproduces the r16 sketch bit-for-bit.
    */
  def sketch(items: DataFrame, groupCols: Seq[String], hashCol: String,
      p: Int = 6): DataFrame = {
    requireP(p)
    val m = registers(p).toLong
    val cap = rhoCap(p)
    val gs = groupCols.map(col)
    val regs = items
      .select(gs :+ col(hashCol).bitwiseAND(lit(m - 1L)).as("hll_reg")
        :+ shiftrightunsigned(col(hashCol), p).as("hll_rest"): _*)
      .select(gs :+ col("hll_reg") :+ rho(p).as("hll_rho"): _*)
      .groupBy(gs :+ col("hll_reg"): _*)
      .agg(max(col("hll_rho")).as("hll_m"))
    regs.groupBy(gs: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $cap - hll_m)")).as("hll_sp"),
        count(lit(1)).as("hll_np"))
      .select(gs
        :+ (lit(m) - col("hll_np")).as("v_zero")
        :+ (col("hll_sp") +
          (lit(m) - col("hll_np")) * lit(1L << cap))
          .as("s_harmonic"): _*)
      .withColumn("est_hll",
        expr(s"${estNumerator(p)}L div (10000L * s_harmonic)"))
      .withColumn("estimate",
        when(col("est_hll") <= smallRange(p) && col("v_zero") > 0L,
          element_at(
            array(linearTable(p).map(lit): _*), col("v_zero").cast("int")))
          .otherwise(col("est_hll")))
  }
}
