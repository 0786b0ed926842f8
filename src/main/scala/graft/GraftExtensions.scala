package graft

import graft.functions.{Hashing, RomanCodec}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** SQL surface for the graft kernels: registers `graft_*` scalar functions
  * so every hashing/codec primitive is callable from `spark.sql(...)` —
  * a user who lives in SQL gets the same codegen'd StaticInvoke
  * expressions the DataFrame API uses (never a UDF).
  *
  * Two entry points, same builder table:
  *  - `spark.sql.extensions=graft.GraftExtensions` (cluster config) injects
  *    at session build;
  *  - [[GraftFunctions.register]] adds them to an already-running session.
  */
object GraftFunctions {

  private def invoke(clazz: Class[_], dt: DataType, method: String,
      nullableOut: Boolean)(args: Seq[Expression]): Expression =
    StaticInvoke(clazz, dt, method, args, inputTypes = Nil,
      propagateNull = true, returnNullable = nullableOut)

  /** Like [[invoke]] but NULL args reach the kernel (for kernels whose
    * documented NULL semantics are not null-out — e.g. robots
    * evaluation, where NULL robots means "no rules" and must yield
    * TRUE, not NULL; the DataFrame surface already does this).
    */
  private def invokeNullIn(clazz: Class[_], dt: DataType, method: String,
      nullableOut: Boolean)(args: Seq[Expression]): Expression =
    StaticInvoke(clazz, dt, method, args, inputTypes = Nil,
      propagateNull = false, returnNullable = nullableOut)

  /** (name, description, builder) for every SQL-exposed kernel. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_to_roman", "int -> Roman numeral string (null outside 1..3999)",
      invoke(classOf[RomanCodec.type], StringType, "toRoman", nullableOut = true) _),
    ("graft_from_roman", "Roman numeral string -> int (0 for invalid)",
      invoke(classOf[RomanCodec.type], IntegerType, "fromRoman", nullableOut = false) _),
    ("graft_hash64", "FNV-1a/splitmix64 64-bit hash of (string, seed)",
      invoke(classOf[Hashing.type], LongType, "hash64", nullableOut = false) _),
    ("graft_hamming", "Hamming distance between two 64-bit hashes",
      invoke(classOf[Hashing.type], IntegerType, "hamming", nullableOut = false) _),
    ("graft_simhash", "64-bit SimHash of an array<string> of tokens",
      invoke(classOf[Hashing.type], LongType, "simhash64", nullableOut = false) _),
    ("graft_fingerprint", "order-sensitive rolling-hash fingerprint of array<string>",
      invoke(classOf[Hashing.type], LongType, "fingerprint", nullableOut = false) _),
    ("graft_cosine", "cosine similarity of two array<float> vectors",
      invoke(classOf[Hashing.type], DoubleType, "cosineF", nullableOut = false) _),
    ("graft_dot", "dot product of two array<float> vectors",
      invoke(classOf[Hashing.type], DoubleType, "dotF", nullableOut = false) _),
    ("graft_l2sq", "squared L2 distance of two array<float> vectors",
      invoke(classOf[Hashing.type], DoubleType, "l2sqF", nullableOut = false) _),
    ("graft_bloom_contains",
      "Bloom membership probe of (words array<long>, numHashes, key)",
      invoke(classOf[Hashing.type], BooleanType, "bloomContains", nullableOut = false) _),
    ("graft_image_format",
      "container sniff of an image binary: 'png' / 'jpeg' / null",
      invoke(classOf[graft.multimodal.MediaHeader.type], StringType,
        "format", nullableOut = true) _),
    ("graft_image_width",
      "pixel width from a PNG IHDR / JPEG SOF header (-1 if corrupt)",
      invoke(classOf[graft.multimodal.MediaHeader.type], IntegerType,
        "width", nullableOut = false) _),
    ("graft_image_height",
      "pixel height from a PNG IHDR / JPEG SOF header (-1 if corrupt)",
      invoke(classOf[graft.multimodal.MediaHeader.type], IntegerType,
        "height", nullableOut = false) _),
    ("graft_html_text",
      "visible text of an HTML string (tags/script/style/head stripped, " +
        "entities decoded, one line per block)",
      invoke(classOf[graft.functions.HtmlText.type], StringType,
        "extractKernel", nullableOut = true) _),
    ("graft_url_canon",
      "canonical form of an absolute http(s) URL (RFC 3986 safe " +
        "normalizations; NULL for relative/other schemes)",
      invoke(classOf[graft.functions.UrlNorm.type], StringType,
        "canonicalizeKernel", nullableOut = true) _),
    ("graft_robots_allowed",
      "RFC 9309 robots.txt decision for (robots_body, agent, path); " +
        "NULL robots (no robots.txt) allows",
      invokeNullIn(classOf[graft.functions.RobotsTxt.type], BooleanType,
        "allowedKernel", nullableOut = false) _),
    ("graft_html_main",
      "main-content text of (html, max_link_pct, min_line_chars) — " +
        "visible text minus link-dominated and too-short lines",
      invoke(classOf[graft.functions.HtmlText.type], StringType,
        "mainContentKernel", nullableOut = true) _))

  /** Register every graft function into a live session's catalog. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(Hashing.getClass.getCanonicalName, name),
        builder)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(Hashing.getClass.getCanonicalName, name),
        builder))
    }
    ext.injectOptimizerRule(_ => RomanRoundTripElimination)
  }
}

/** Optimizer rule: `from_roman(to_roman(x))` collapses to the algebraic
  * identity `IF(x BETWEEN 1 AND 3999, x, NULL)` — the codec round-trip
  * never needs to materialize the Roman string. Domain handling is exact:
  * outside 1..3999 `to_roman` yields null, which propagates through
  * `from_roman` as null, so the rewrite substitutes null there too.
  * Demonstrates the engine's injectable-optimization surface on graft's
  * own expression family.
  */
object RomanRoundTripElimination
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.IntegerType

  private def isCodec(cls: Class[_], method: String, si: StaticInvoke): Boolean =
    si.staticObject == cls && si.functionName == method

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer: StaticInvoke
          if isCodec(classOf[functions.RomanCodec.type], "fromRoman", outer) &&
            outer.arguments.headOption.exists {
              case inner: StaticInvoke =>
                isCodec(classOf[functions.RomanCodec.type], "toRoman", inner)
              case _ => false
            } =>
        val x = outer.arguments.head.asInstanceOf[StaticInvoke].arguments.head
        If(And(GreaterThanOrEqual(x, Literal(1)), LessThanOrEqual(x, Literal(3999))),
          x, Literal(null, IntegerType))
    }
}
