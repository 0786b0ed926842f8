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

  /** Charset lookup with POSITIVE AND NEGATIVE caching. The JDK caches
    * only successful lookups — `Charset.forName`/`isSupported` on an
    * UNKNOWN label walks the full charset-provider chain every call
    * (measured 247 µs/record at the r11 100× probe: the unknown-label
    * class alone cost 25 s of CPU). Negative entries are what a crawl
    * needs — bogus labels repeat millions of times. Positive entries
    * cache unconditionally (key space bounded by the JVM's alias set,
    * case-folded); only NEGATIVE entries are capped, so minted unique
    * labels can't evict or starve legitimate ones (past the cap,
    * unknown-label misses just pay the slow path).
    */
  private val charsetCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val NegativeEntry = new Object
  private val NegativeCacheMax = 1024
  private val negativeCount = new java.util.concurrent.atomic.AtomicInteger

  private def lookupCharset(name: String): java.nio.charset.Charset = {
    // charset names are ASCII case-insensitive (RFC 2978); lowercasing
    // the key bounds the POSITIVE key space by the JVM's real alias set
    // (a few hundred), so positives cache unconditionally — the r11
    // ADVICE scenario (attacker-minted bogus labels filling the cap and
    // evicting nothing, so later legitimate labels pay the full
    // provider walk forever) can only waste the NEGATIVE budget, and
    // only its own entries
    val key = name.toLowerCase(java.util.Locale.ROOT)
    val hit = charsetCache.get(key)
    if (hit != null)
      return if (hit eq NegativeEntry) null
        else hit.asInstanceOf[java.nio.charset.Charset]
    val cs =
      try java.nio.charset.Charset.forName(name)
      catch { case _: Exception => null }
    if (cs != null) charsetCache.put(key, cs)
    else if (negativeCount.get < NegativeCacheMax &&
        charsetCache.putIfAbsent(key, NegativeEntry) == null)
      negativeCount.incrementAndGet()
    cs
  }

  /** True when the JVM can decode `charset`. */
  def charsetSupportedKernel(charset: UTF8String): Boolean =
    charset != null && lookupCharset(charset.toString) != null

  /** Strict decode of `body` as `charset` → UTF-8 string; null when the
    * charset is unsupported or the bytes don't conform (REPORT, not
    * REPLACE — no silent U+FFFD injection). A leading BOM consumed by the
    * charset's decoder (UTF-16) never reaches the text.
    */
  def decodeKernel(body: Array[Byte], charset: UTF8String): UTF8String = {
    if (body == null || charset == null) return null
    val cs = lookupCharset(charset.toString)
    if (cs == null) return null
    try {
      val dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(body)).toString)
    } catch { case _: Exception => null }
  }

  // ---- unlabeled-body recovery (WHATWG encoding sniff) --------------------
  //
  // q100's path treats an ABSENT charset label as UTF-8 (strict) — correct
  // for the modern web, but a real crawl's unlabeled tail is full of
  // legacy-encoded captures that then surface as `undecodable`. The
  // WHATWG encoding standard defines the deterministic recovery browsers
  // apply and HTML5 documents: BOM sniffing FIRST (EF BB BF → UTF-8,
  // FF FE → UTF-16LE, FE FF → UTF-16BE; the BOM never reaches the text),
  // otherwise validate as UTF-8, otherwise fall back to windows-1252
  // (whose decode total-maps every byte — undefined slots pass through as
  // C1 controls, which q99's control-char signal then counts downstream).

  /** The charset the WHATWG sniff selects for an unlabeled body. */
  def sniffCharsetKernel(body: Array[Byte]): UTF8String = {
    if (body == null) return null
    UTF8String.fromString(sniff(body))
  }

  private def sniff(body: Array[Byte]): String = {
    if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
      (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf) "utf-8-bom"
    else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
      (body(1) & 0xff) == 0xfe) "utf-16le"
    else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
      (body(1) & 0xff) == 0xff) "utf-16be"
    else if (isValidUtf8(body, 0)) "utf-8"
    else "windows-1252"
  }

  /** Strict UTF-8 validation without building a string — the sniff used
    * to VALIDATE by running a full CharsetDecoder whose output was
    * discarded, and the decode kernel then decoded the same bytes again
    * (the double-decode class this module's labeled path already
    * eliminated; r11 review). Rejects exactly what REPORT rejects:
    * truncated sequences, bare continuations, overlongs, surrogates,
    * and code points past U+10FFFF.
    */
  private def isValidUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation lead / overlong 2-byte
      else if (c < 0xe0) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) {
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80 // overlong guard
        val hi = if (c == 0xed) 0x9f else 0xbf // surrogate guard
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) {
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80 // overlong guard
        val hi = if (c == 0xf4) 0x8f else 0xbf // > U+10FFFF guard
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 ||
          (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false // f5..ff never valid
    }
    true
  }

  /** The WHATWG windows-1252 decode is TOTAL: 0x80–0x9F map per the
    * encoding standard's index (Java's strict Cp1252 rejects the five
    * undefined slots; WHATWG maps them to their C1 controls so damage
    * stays countable), everything else is the Latin-1 identity.
    */
  private val Cp1252High: Array[Char] = Array(
    '€', '', '‚', 'ƒ', '„', '…', '†',
    '‡', 'ˆ', '‰', 'Š', '‹', 'Œ', '',
    'Ž', '', '', '‘', '’', '“', '”',
    '•', '–', '—', '˜', '™', 'š', '›',
    'œ', '', 'ž', 'Ÿ')

  private def decode1252(body: Array[Byte]): String = {
    val out = new Array[Char](body.length)
    var i = 0
    while (i < body.length) {
      val b = body(i) & 0xff
      out(i) = if (b >= 0x80 && b <= 0x9f) Cp1252High(b - 0x80) else b.toChar
      i += 1
    }
    new String(out)
  }

  /** Decode an unlabeled body under the sniffed charset; the BOM (when
    * present) is consumed, never emitted. Total: every byte sequence
    * decodes (the 1252 fallback is a total map), so unlike the labeled
    * path there is no `undecodable` reason here — garbage degrades to
    * C1 controls the encoding-quality gate counts, it never vanishes.
    */
  def sniffDecodeKernel(body: Array[Byte]): UTF8String = {
    if (body == null) return null
    sniff(body) match {
      case "utf-8-bom" =>
        // payload may still contradict the BOM (torn multi-byte tail)
        if (isValidUtf8(body, 3))
          UTF8String.fromBytes(body, 3, body.length - 3)
        else null
      case "utf-16le" => // java's UTF-16 consumes the BOM itself
        decodeKernel(body, UTF8String.fromString("utf-16"))
      case "utf-16be" =>
        decodeKernel(body, UTF8String.fromString("utf-16"))
      case "windows-1252" => UTF8String.fromString(decode1252(body))
      case _ => // "utf-8": already validated by the sniff — zero-copy
        UTF8String.fromBytes(body, 0, body.length)
    }
  }

  /** Sniffed charset of an unlabeled body column (see kernel docs). */
  def sniffedCharset(body: Column): Column =
    col(StaticInvoke(classOf[WarcTranscode.type], StringType,
      "sniffCharsetKernel", Seq(ex(body)), Nil, propagateNull = true,
      returnNullable = true))

  /** UTF-8 text of an unlabeled body via the WHATWG sniff. NULL only for
    * a NULL body or a BOM-labeled body whose payload contradicts the BOM
    * (torn multi-byte tail).
    */
  def sniffedText(body: Column): Column =
    col(StaticInvoke(classOf[WarcTranscode.type], StringType,
      "sniffDecodeKernel", Seq(ex(body)), Nil, propagateNull = true,
      returnNullable = true))

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

  /** True when the JVM can decode the (effective) charset label. */
  def charsetSupported(charset: Column): Column =
    col(StaticInvoke(classOf[WarcTranscode.type], BooleanType,
      "charsetSupportedKernel", Seq(ex(effective(charset))), Nil,
      propagateNull = true, returnNullable = false))

  /** Why [[utf8Text]] is NULL: `unsupported_charset` / `undecodable` /
    * NULL (decoded fine). Countable map-side, the damage-audit column.
    */
  def failReason(body: Column, charset: Column): Column =
    when(!charsetSupported(charset), lit(ReasonUnsupported))
      .when(utf8Text(body, charset).isNull, lit(ReasonUndecodable))
      .otherwise(lit(null).cast("string"))

  /** [[failReason]] over an ALREADY-DECODED text column — the shape for
    * a projection that materializes [[utf8Text]] once and derives the
    * reason from it, instead of paying the strict decode twice per
    * record (the r11 100× probe measured the double-decode directly).
    */
  def failReasonFromText(decodedText: Column, charset: Column): Column =
    when(!charsetSupported(charset), lit(ReasonUnsupported))
      .when(decodedText.isNull, lit(ReasonUndecodable))
      .otherwise(lit(null).cast("string"))
}
