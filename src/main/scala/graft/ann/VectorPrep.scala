package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vector storage preparation — the leg between raw embeddings and the
  * ANN indexes (q21/q22/q32/q65): production vector stores keep int8
  * SCALAR-QUANTIZED codes (4× smaller than float32, SIMD-friendly — the
  * standard "SQ8" layout of public ANN libraries) plus the precomputed
  * L2 norm that turns cosine into a dot product at query time. At
  * 100 TB of embeddings the quantization decides the working-set size
  * of every search after it, and the reconstruction-error audit emitted
  * here is how a pipeline decides SQ8 is safe before committing to it.
  *
  * Determinism discipline (everything an external engine replays
  * bit-for-bit):
  *  - components quantize FIRST to milli-units, qi = floor(v·1000) —
  *    float→double widening is exact and IEEE multiply/floor agree
  *    across engines — so all later arithmetic is BIGINT;
  *  - the per-vector scale is max|qi| and codes are the exact
  *    floor(qi·127/max|qi|) via the subtract-positive-mod-then-divide
  *    pattern (the q126/q127 discipline — no division rounding can
  *    move an integer quotient);
  *  - the norm is floor(√Σqi²): the argument is an exact ≤2⁵³ integer
  *    and IEEE-754 sqrt is correctly rounded on every engine;
  *  - the audit is Σ|qi − dequant(code_i)| — exact BIGINT.
  *
  * Scale shape: ONE map-side pass of codegen array lambdas — zero
  * shuffles, zero UDFs; null/empty vectors yield honest NULL/zero rows
  * rather than errors (damage posture).
  */
object VectorPrep {

  /** Exact floor(a/b) for BIGINT columns, b > 0. */
  private def floorDiv(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    ((a - pmod(a, b)) / b).cast("long")

  /** Per-vector SQ8 prep report. Output: idCol, n_dims, norm_x1e3
    * (floor of 1000·‖v‖₂), max_abs_q (the quantization scale in
    * milli-units), argmax_dim (1-based first dimension attaining it),
    * quant_mae_sum (Σ|qi − dequant(code_i)| in milli-units — the SQ8
    * reconstruction audit), is_zero (a degenerate all-zero vector
    * quantizes to all-zero codes and is flagged, not divided by).
    */
  def sq8Report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = transform(col(vecCol),
      v => floor(v.cast("double") * 1000).cast("long"))
    val maxq = aggregate(q, lit(0L), (a, x) => greatest(a, abs(x)))
    // bind the quantized array + scale once; every downstream lambda
    // touches only its bound variables (the shingles O(n²) lesson)
    df.select(col(idCol), q.as("_q"), maxq.as("max_abs_q"))
      .select(
        col(idCol),
        size(col("_q")).cast("long").as("n_dims"),
        floor(sqrt(aggregate(col("_q"), lit(0L),
          (a, x) => a + x * x).cast("double"))).cast("long")
          .as("norm_x1e3"),
        col("max_abs_q"),
        // 1-based first position; Spark signals "absent" (only possible
        // for an EMPTY vector) as 0 where DuckDB's list_position yields
        // NULL — nullif aligns the two
        nullif(array_position(transform(col("_q"), x => abs(x)),
          col("max_abs_q")), lit(0L)).cast("long").as("argmax_dim"),
        when(col("max_abs_q") === 0L, lit(0L))
          .otherwise(aggregate(col("_q"), lit(0L), (a, x) => {
            val code = floorDiv(x * 127L, col("max_abs_q"))
            val recon = floorDiv(code * col("max_abs_q"), lit(127L))
            a + abs(x - recon)
          })).as("quant_mae_sum"),
        (col("max_abs_q") === 0L).as("is_zero"))
  }
}
