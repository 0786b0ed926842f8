package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-native data-quality expectations — the engine analog of the
  * reference's great_expectations suite (/root/reference/dags/
  * aggregates_python_helpers.py:33-68): regex match, value-in-set,
  * distinct-in-set, not-null, between, each with a `mostly` threshold
  * (expect_column_values_to_match_regex(..., mostly=0.85)).
  *
  * All expectations evaluate in ONE aggregation pass over the data —
  * a conditional count per expectation inside a single `agg` — so a
  * 100 TB validation run costs one scan, not one scan per expectation.
  */
sealed trait Expectation {
  def name: String

  /** Row-level pass predicate. */
  def passCond: Column

  /** Minimum passing fraction, in integer percent (100 = all rows). */
  def mostlyPct: Int
}

final case class MatchRegex(name: String, column: Column, regex: String,
    mostlyPct: Int = 100) extends Expectation {
  def passCond: Column = column.isNotNull && column.rlike(regex)
}

final case class InSet(name: String, column: Column, values: Seq[Any],
    mostlyPct: Int = 100) extends Expectation {
  def passCond: Column = column.isin(values: _*)
}

final case class NotNull(name: String, column: Column, mostlyPct: Int = 100)
    extends Expectation {
  def passCond: Column = column.isNotNull
}

final case class Between(name: String, column: Column, lo: Any, hi: Any,
    mostlyPct: Int = 100) extends Expectation {
  def passCond: Column = column >= lit(lo) && column <= lit(hi)
}

object Validator {

  /** Evaluate all expectations in a single pass. Output: one row per
    * expectation with integer-only metrics (engine-portable, no float
    * comparisons): expectation, n_rows, n_pass, mostly_pct, success.
    */
  def validate(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    val counters = count(lit(1)).as("n_rows") +:
      expectations.zipWithIndex.map { case (e, i) =>
        sum(when(e.passCond, 1L).otherwise(0L)).as(s"_pass_$i")
      }
    val one = df.agg(counters.head, counters.tail: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      struct(
        lit(e.name).as("expectation"),
        col("n_rows"),
        col(s"_pass_$i").as("n_pass"),
        lit(e.mostlyPct).as("mostly_pct"))
    }
    one
      .select(explode(array(rows: _*)).as("r"))
      .select("r.*")
      .withColumn("success",
        col("n_pass") * 100 >= col("mostly_pct").cast("long") * col("n_rows"))
  }

  /** Render a validation result as a compact JSON report string (the
    * engine-side analog of the reference's HTML report email).
    */
  def renderJson(result: DataFrame): String =
    result.toJSON.collect().mkString("[", ",", "]")
}
