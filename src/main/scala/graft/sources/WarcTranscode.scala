package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset transcoding for WARC HTTP bodies — the missing step between the
  * container parse ([[GraftWarc.read]] emits raw `body` bytes) and every
  * text operator (which all assume UTF-8 strings). Real web corpora are
  * full of ISO-8859-1 / Windows-125x / UTF-16 captures; feeding their raw
  * bytes through a UTF-8 decode is exactly how the mojibake that
  * q99_encoding_quality DETECTS gets created — this module prevents it at
  * ingest instead (VERDICT r10 gap #1). The reference analog is the CSV
  * reader's explicit encoding handling (helpers.py:172-197 parses with a
  * fixed schema rather than sniffing).
  *
  * Semantics (strict, never lossy):
  *  - the charset comes from the HTTP `Content-Type` header's `charset`
  *    parameter ([[charsetOf]]); absent → UTF-8, today's web default;
  *  - decoding is STRICT (malformed input and unmappable characters
  *    REPORT, never replace): a body that does not conform to its declared
  *    charset yields NULL text plus reason `undecodable` — a mislabeled
  *    capture must never leak half-mojibake text into the corpus;
  *  - an unsupported/unknown charset label yields NULL text plus reason
  *    `unsupported_charset`.
  *
  * Scale shape: pure map-side column kernels (StaticInvoke inside
  * whole-stage codegen, the MediaHeader pattern) — zero shuffles; the
  * reason column makes routing/counting declarative ([[GraftCsv]]'s
  * corrupt-record contract at the character-encoding layer).
  */
object WarcTranscode {

  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  /** Reason labels, in precedence order. */
  val ReasonUnsupported = "unsupported_charset"
  val ReasonUndecodable = "undecodable"

  // ---- static kernels (Catalyst-facing; UTF8String in/out) ---------------

  /** True when the JVM can decode `charset`. */
  def charsetSupportedKernel(charset: UTF8String): Boolean =
    charset != null &&
      (try java.nio.charset.Charset.isSupported(charset.toString)
       catch { case _: Exception => false })

  /** Strict decode of `body` as `charset` → UTF-8 string; null when the
    * charset is unsupported or the bytes don't conform (REPORT, not
    * REPLACE — no silent U+FFFD injection). A leading BOM consumed by the
    * charset's decoder (UTF-16) never reaches the text.
    */
  def decodeKernel(body: Array[Byte], charset: UTF8String): UTF8String = {
    if (body == null || charset == null) return null
    try {
      val dec = java.nio.charset.Charset.forName(charset.toString).newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(body)).toString)
    } catch { case _: Exception => null }
  }

  // ---- column surface -----------------------------------------------------

  /** The lower-cased `charset` parameter of a Content-Type value, or NULL
    * when absent (token chars per RFC 2045, optionally double-quoted).
    */
  def charsetOf(contentType: Column): Column =
    lower(nullif(regexp_extract(coalesce(contentType, lit("")),
      "(?i)charset=\"?\\s*([A-Za-z0-9._:+-]+)", 1), lit("")))

  /** Effective charset: declared, else the UTF-8 web default. */
  private def effective(charset: Column): Column =
    coalesce(charset, lit("utf-8"))

  /** Strict transcode of `body` under `charset` (from [[charsetOf]];
    * null → UTF-8 default) to a UTF-8 text column; NULL on unsupported
    * charset or non-conforming bytes (see [[failReason]]).
    */
  def utf8Text(body: Column, charset: Column): Column =
    col(StaticInvoke(classOf[WarcTranscode.type], StringType, "decodeKernel",
      Seq(ex(body), ex(effective(charset))), Nil, propagateNull = true,
      returnNullable = true))

  /** Why [[utf8Text]] is NULL: `unsupported_charset` / `undecodable` /
    * NULL (decoded fine). Countable map-side, the damage-audit column.
    */
  def failReason(body: Column, charset: Column): Column = {
    val supported = col(StaticInvoke(classOf[WarcTranscode.type], BooleanType,
      "charsetSupportedKernel", Seq(ex(effective(charset))), Nil,
      propagateNull = true, returnNullable = false))
    when(!supported, lit(ReasonUnsupported))
      .when(utf8Text(body, charset).isNull, lit(ReasonUndecodable))
      .otherwise(lit(null).cast("string"))
  }
}
