package graft.sources

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded PDF text extraction — the largest token-yield gap behind the
  * [[ContentRoute]] dispatch (VERDICT r12 "what's missing" #2): a real LLM
  * web corpus keeps 5–15% of its tokens in `application/pdf` captures,
  * which the router previously could only count as binary skips.
  *
  * This is a from-spec implementation of the PUBLIC subset of ISO 32000-1
  * that yields visible text without a font subsystem:
  *
  *  - '''object/stream walk''' (§7.3.8): `stream … endstream` bodies
  *    located sequentially, honoring the dict's `/Length` when it is a
  *    direct integer and falling back to an `endstream` scan otherwise
  *    (lenient readers reconstruct broken xref tables the same way; no
  *    xref parse is needed for a linear walk);
  *  - '''FlateDecode''' (§7.4.4): zlib (RFC 1950) inflate via
  *    `java.util.zip.Inflater` — the JDK's public zlib binding, the same
  *    family as the q94 `deflatedLen` kernel but inverted. Output per
  *    stream is capped (zip-bomb guard, [[MaxStreamBytes]]) — a capped
  *    stream is a LOUD `stream_too_large`, never silent truncation;
  *  - '''text operators''' (§9.4): `BT…ET` blocks; `Tj`, `'`, `"` show a
  *    literal/hex string; `TJ` shows each string of its array (kerning
  *    numbers ignored); `Td`/`TD`/`T*`/`'`/`"` start a new output line.
  *    Literal strings decode the full escape set (§7.3.4.2): `\n \r \t
  *    \b \f \( \) \\`, 1–3 digit octal, line continuations, and balanced
  *    nested parentheses; hex strings pad an odd final nibble with 0.
  *
  * Out-of-subset shapes fail SOFT with an attributable reason, never a
  * throw (the q83/q95 corrupt-blob contract): missing `%PDF-` header →
  * `not_pdf`; an `/Encrypt` entry outside stream bodies → `encrypted`
  * (§7.6 — decrypting needs the security handler, firmly out of subset);
  * a stream that never terminates or whose inflate fails → `torn`; a
  * well-formed PDF whose streams show no text → `no_text`. String bytes
  * are decoded as UTF-8 (real PDFs map bytes through per-font encodings
  * and CMaps — the documented subset boundary; ASCII, which TESTDATA
  * text is by construction, is identical under both).
  *
  * Streams whose object dict carries `/Subtype /Image` are skipped
  * (pixel data, not content). Object streams (`/Type /ObjStm`,
  * compressed-object containers) are out of subset: their CONTENTS are
  * not walked, so text inside them reads as `no_text` — the honest
  * bounded posture, documented here.
  *
  * Scale shape: a pure per-row kernel (bytes in, `[text, reason]` out)
  * invoked via StaticInvoke — map-side, inside whole-stage codegen, no
  * UDF, no shuffle. Reference analog: the explicit parse-or-NULL posture
  * of the CSV schema router (aggregates_python_helpers.py:172-197).
  */
object PdfText {

  val ReasonOk = "ok"
  val ReasonNotPdf = "not_pdf"
  val ReasonEncrypted = "encrypted"
  val ReasonTorn = "torn"
  val ReasonNoText = "no_text"
  val ReasonTooLarge = "stream_too_large"

  /** Per-stream inflate cap: a content stream that inflates past this is
    * a zip bomb or far outside the text subset either way — fail loud.
    */
  val MaxStreamBytes: Int = 64 << 20

  /** Kernel entry: `[text, reason]` (text NULL unless reason is `ok`). */
  def extract(blob: Array[Byte]): ArrayData = {
    val (text, reason) = extractText(blob)
    new GenericArrayData(Array[Any](
      if (text == null) null else UTF8String.fromString(text),
      UTF8String.fromString(reason)))
  }

  private[graft] def extractText(b: Array[Byte]): (String, String) = {
    if (b == null || b.length < 5 || !matchesAt(b, 0, "%PDF-"))
      return (null, ReasonNotPdf)
    // ---- stream segmentation ------------------------------------------
    // each entry: (dictStart, dataStart, dataEnd) — dictStart bounds the
    // backward /FlateDecode//Subtype search to this object's dict
    val segs = new scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]
    var pos = 0
    var torn = false
    while (pos >= 0 && pos < b.length && !torn) {
      val k = indexOf(b, "stream", pos)
      if (k < 0) pos = -1
      else if (!isStreamKeyword(b, k)) pos = k + 6
      else {
        var ds = k + 6
        if (ds < b.length && b(ds) == '\r') ds += 1
        if (ds < b.length && b(ds) == '\n') ds += 1
        val dictStart = math.max(lastIndexOf(b, "obj", k), 0)
        // honor a direct-integer /Length; fall back to an endstream scan
        val len = directLength(b, dictStart, k)
        val de =
          if (len >= 0 && ds + len <= b.length &&
              indexOf(b, "endstream", ds + len) >= 0 &&
              indexOf(b, "endstream", ds + len) - (ds + len) <= 2)
            ds + len
          else indexOf(b, "endstream", ds)
        if (de < 0) torn = true
        else { segs += ((dictStart, ds, de)); pos = de + 9 }
      }
    }
    if (torn) return (null, ReasonTorn)
    // ---- encryption: /Encrypt anywhere OUTSIDE stream bodies ----------
    if (foundOutsideStreams(b, "/Encrypt", segs.toSeq))
      return (null, ReasonEncrypted)
    // ---- per-stream decode + text-operator scan -----------------------
    val out = new java.lang.StringBuilder
    var emitted = false
    var pendingNewline = false
    var i = 0
    while (i < segs.length) {
      val (dictStart, ds, de) = segs(i)
      val isImage = subtypeIsImage(b, dictStart, ds)
      if (!isImage) {
        val flate = indexOf(b, "/FlateDecode", dictStart, k = ds) >= 0
        val raw = java.util.Arrays.copyOfRange(b, ds, de)
        val data =
          if (!flate) raw
          else inflate(raw) match {
            case null => return (null, ReasonTorn)
            case InflateTooLarge => return (null, ReasonTooLarge)
            case d => d
          }
        pendingNewline = true // a new stream starts a new output line
        val r = scanOps(data, out, emitted, pendingNewline)
        emitted = r._1; pendingNewline = r._2
      }
      i += 1
    }
    if (!emitted) (null, ReasonNoText) else (out.toString, ReasonOk)
  }

  // sentinel distinguishing "inflate failed" (null) from "capped"
  private val InflateTooLarge = new Array[Byte](0)

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val bos = new java.io.ByteArrayOutputStream(math.min(raw.length * 4, 1 << 16))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return null }
        if (n == 0 && inf.needsInput()) return null // truncated
        bos.write(buf, 0, n)
        if (bos.size() > MaxStreamBytes) return InflateTooLarge
      }
      bos.toByteArray
    } finally inf.end()
  }

  /** Scan one decoded content stream for text-showing operators; append
    * to `out`. Returns the updated (emitted, pendingNewline) state.
    */
  private def scanOps(c: Array[Byte], out: java.lang.StringBuilder,
      emitted0: Boolean, pending0: Boolean): (Boolean, Boolean) = {
    var emitted = emitted0
    var pending = pending0
    var inText = false
    // string operands seen since the last operator (TJ shows them all)
    val strings = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    def emit(all: Boolean): Unit = if (inText && strings.nonEmpty) {
      val toShow = if (all) strings.toSeq else Seq(strings.last)
      if (emitted && pending) out.append('\n')
      toShow.foreach(s => out.append(new String(s, java.nio.charset.StandardCharsets.UTF_8)))
      emitted = true
      pending = false
    }
    var i = 0
    while (i < c.length) {
      val ch = c(i)
      if (ch == '%') { // comment to EOL
        while (i < c.length && c(i) != '\n' && c(i) != '\r') i += 1
      } else if (ch == '(') {
        val (s, ni) = literalString(c, i + 1)
        strings += s; i = ni - 1
      } else if (ch == '<' && i + 1 < c.length && c(i + 1) == '<') {
        i += 1 // dict-open inside content (BDC etc.) — skip as noise
      } else if (ch == '<') {
        val (s, ni) = hexString(c, i + 1)
        strings += s; i = ni - 1
      } else if (ch == '[') {
        strings.clear() // TJ array start
      } else if (ch == '/') { // name operand (/F1, /GS0, …): keep strings
        i += 1
        while (i < c.length && !isDelim(c(i)) && !isWs(c(i))) i += 1
        i -= 1
      } else if (isDelim(ch)) {
        // ']' (operands kept for TJ), stray ')'/'>'/'{'/'}' — noise;
        // handling every delimiter HERE guarantees the token read below
        // always consumes ≥ 1 byte (a zero-length token would stall the
        // scan forever)
        ()
      } else if (!isWs(ch)) {
        val start = i
        while (i < c.length && !isDelim(c(i)) && !isWs(c(i))) i += 1
        val tok = new String(c, start, i - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        i -= 1
        tok match {
          case "BT" => inText = true; pending = true; strings.clear()
          case "ET" => inText = false; strings.clear()
          case "Tj" => emit(all = false); strings.clear()
          case "TJ" => emit(all = true); strings.clear()
          case "'" => pending = true; emit(all = false); strings.clear()
          case "\"" => pending = true; emit(all = false); strings.clear()
          case "Td" | "TD" | "T*" =>
            if (inText) pending = true
            strings.clear()
          case t if isNumber(t) => () // operand — keep strings
          case _ => strings.clear() // any other operator consumes operands
        }
      }
      i += 1
    }
    (emitted, pending)
  }

  /** Literal string body starting AFTER the opening paren; returns the
    * decoded bytes and the index AFTER the closing paren (§7.3.4.2).
    */
  private def literalString(c: Array[Byte], from: Int): (Array[Byte], Int) = {
    val bos = new java.io.ByteArrayOutputStream
    var depth = 1
    var i = from
    while (i < c.length && depth > 0) {
      val ch = c(i)
      if (ch == '\\' && i + 1 < c.length) {
        i += 1
        c(i) match {
          case 'n' => bos.write('\n')
          case 'r' => bos.write('\r')
          case 't' => bos.write('\t')
          case 'b' => bos.write('\b')
          case 'f' => bos.write('\f')
          case '(' => bos.write('(')
          case ')' => bos.write(')')
          case '\\' => bos.write('\\')
          case '\r' => if (i + 1 < c.length && c(i + 1) == '\n') i += 1
          case '\n' => () // line continuation: both EOL forms vanish
          case d if d >= '0' && d <= '7' =>
            var v = d - '0'
            var k = 0
            while (k < 2 && i + 1 < c.length &&
                c(i + 1) >= '0' && c(i + 1) <= '7') {
              i += 1; v = v * 8 + (c(i) - '0'); k += 1
            }
            bos.write(v & 0xff)
          case other => bos.write(other) // spec: backslash is dropped
        }
      } else if (ch == '(') { depth += 1; bos.write('(') }
      else if (ch == ')') { depth -= 1; if (depth > 0) bos.write(')') }
      else if (ch == '\r') { // EOL inside literal reads as \n
        bos.write('\n')
        if (i + 1 < c.length && c(i + 1) == '\n') i += 1
      } else bos.write(ch)
      i += 1
    }
    (bos.toByteArray, i)
  }

  /** Hex string body after `<`; returns bytes and index after `>`. */
  private def hexString(c: Array[Byte], from: Int): (Array[Byte], Int) = {
    val bos = new java.io.ByteArrayOutputStream
    var hi = -1
    var i = from
    while (i < c.length && c(i) != '>') {
      val v = Character.digit(c(i), 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { bos.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) bos.write(hi << 4) // odd final nibble pads with 0
    (bos.toByteArray, i + 1)
  }

  // ---- byte-scan helpers ----------------------------------------------

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
    b == '{' || b == '}' || b == '/' || b == '%'
  private def isNumber(t: String): Boolean =
    t.nonEmpty && t.forall(ch => (ch >= '0' && ch <= '9') ||
      ch == '+' || ch == '-' || ch == '.')

  private def matchesAt(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at < 0 || at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** PDF whitespace (ISO 32000 §7.2.2). */
  private def isPdfWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' ||
      c == 0

  /** True iff the dict region [from, until) carries the COMBINED
    * pattern `/Subtype<ws*>/Image` with a name boundary after `Image`
    * — two independent substring probes also matched `/ImageMask`
    * keys or an unrelated name containing "Image" next to any
    * `/Subtype`, silently dropping text-bearing streams as pixel data.
    */
  private def subtypeIsImage(b: Array[Byte], from: Int,
      until: Int): Boolean = {
    var i = from
    while (i < until) {
      val st = indexOf(b, "/Subtype", i, k = until)
      if (st < 0) return false
      var j = st + 8
      while (j < until && isPdfWs(b(j))) j += 1
      if (j + 6 <= until && matchesAt(b, j, "/Image")) {
        // name boundary: delimiter/whitespace/end — NOT a regular
        // name char, so /ImageMask (a different name) never matches
        val e = j + 6
        if (e >= until || isPdfWs(b(e)) || b(e) == '/' || b(e) == '>' ||
            b(e) == '<' || b(e) == '[' || b(e) == ']' || b(e) == '(' ||
            b(e) == ')' || b(e) == '%') return true
      }
      i = st + 1
    }
    false
  }

  private def indexOf(b: Array[Byte], s: String, from: Int,
      k: Int = Int.MaxValue): Int = {
    var i = math.max(from, 0)
    val last = math.min(b.length, k) - s.length
    while (i <= last) {
      if (matchesAt(b, i, s)) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(b: Array[Byte], s: String, before: Int): Int = {
    var i = math.min(before, b.length) - s.length
    while (i >= 0) {
      if (matchesAt(b, i, s)) return i
      i -= 1
    }
    -1
  }

  /** `stream` at k must be a keyword: preceded by whitespace or `>`
    * (dict close) and followed by an EOL.
    */
  private def isStreamKeyword(b: Array[Byte], k: Int): Boolean = {
    val prevOk = k == 0 || isWs(b(k - 1)) || b(k - 1) == '>'
    val e = k + 6
    val nextOk = e < b.length && (b(e) == '\r' || b(e) == '\n')
    prevOk && nextOk
  }

  /** Direct-integer `/Length N` inside [dictStart, dictEnd); −1 when
    * absent or an indirect reference (`N 0 R`).
    */
  private def directLength(b: Array[Byte], dictStart: Int, dictEnd: Int): Int = {
    val at = indexOf(b, "/Length", dictStart, k = dictEnd)
    if (at < 0) return -1
    var i = at + 7
    while (i < dictEnd && isWs(b(i))) i += 1
    var v = 0
    var any = false
    while (i < dictEnd && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); any = true; i += 1
    }
    if (!any) return -1
    while (i < dictEnd && isWs(b(i))) i += 1
    // `N 0 R` indirect reference → another integer follows → not direct
    if (i < dictEnd && b(i) >= '0' && b(i) <= '9') -1 else v
  }

  private def foundOutsideStreams(b: Array[Byte], s: String,
      segs: Seq[(Int, Int, Int)]): Boolean = {
    var from = 0
    val it = (segs.map { case (_, ds, de) => (ds, de) } :+
      ((b.length, b.length))).iterator
    while (it.hasNext) {
      val (ds, de) = it.next()
      if (indexOf(b, s, from, k = ds) >= 0) return true
      from = de
    }
    false
  }

  // ---- planted fixture (q123) -----------------------------------------

  /** Deterministic per-doc PDF for the q123 oracle — five payload classes
    * by `docId % 5`, every expected output composable from arithmetic
    * (the q95/q111 fixture doctrine) while the extractor must genuinely
    * walk objects, inflate, and replay string escapes:
    *  - 0: uncompressed content stream, two `Tj` lines;
    *  - 1: REAL FlateDecode stream (JDK zlib), a kerned `TJ` array plus a
    *    `Td`-advanced second line;
    *  - 2: `/Encrypt` in the trailer → NULL + `encrypted`;
    *  - 3: torn mid-stream (no `endstream`) → NULL + `torn`;
    *  - 4: a valid PDF whose only stream draws no text → NULL + `no_text`.
    * The doc text rides inside a literal string with full escaping, so
    * extraction round-trips it exactly.
    */
  def fixture(docId: Long, text: UTF8String): Array[Byte] = {
    val t = if (text == null) "" else text.toString
    ((docId % 5).toInt: @annotation.switch) match {
      case 0 =>
        val content = s"BT (Doc $docId uncompressed) Tj T* (${esc(t)}) Tj ET"
        skeleton(content.getBytes("UTF-8"), flate = false, trailer = "")
      case 1 =>
        val content =
          s"BT [(Doc ) -250 ($docId) 120 ( flate)] TJ 0 -14 Td (${esc(t)}) Tj ET"
        skeleton(deflate(content.getBytes("UTF-8")), flate = true, trailer = "")
      case 2 =>
        skeleton("BT (hidden) Tj ET".getBytes("UTF-8"), flate = false,
          trailer = "/Encrypt 9 0 R ")
      case 3 =>
        val full = skeleton(deflate(s"BT (Doc $docId torn) Tj ET"
          .getBytes("UTF-8")), flate = true, trailer = "")
        val cut = indexOf(full, "endstream", 0)
        java.util.Arrays.copyOfRange(full, 0, cut - 8)
      case _ =>
        skeleton("q 1 0 0 1 0 0 cm Q".getBytes("UTF-8"), flate = false,
          trailer = "")
    }
  }

  // ---- Info-dictionary metadata (q141) -------------------------------------

  /** Document-information metadata (§14.3.3): `[title, author,
    * creation_date_raw]` from the trailer's `/Info` object — the
    * provenance fields a corpus keeps beside PDF text (dates for
    * recency keepers, titles as document headers). Bounded subset:
    * the LAST `trailer` wins (incremental updates append), the Info
    * ref must be an indirect `N G R`, and values must be direct
    * literal strings (the full §7.3.4.2 escape set via the shared
    * [[literalString]] decoder); anything else — no header, no
    * trailer, indirect strings, a missing object — answers NULLs,
    * never a throw. Same per-row map-side kernel shape as [[extract]].
    */
  def infoMeta(blob: Array[Byte]): ArrayData = {
    val nulls = new GenericArrayData(Array[Any](null, null, null))
    if (blob == null || !matchesAt(blob, 0, "%PDF-")) return nulls
    val tr = lastIndexOf(blob, "trailer", blob.length)
    if (tr < 0) return nulls
    val infoAt = indexOf(blob, "/Info", tr)
    if (infoAt < 0) return nulls
    var i = infoAt + 5
    while (i < blob.length && isWs(blob(i))) i += 1
    val numStart = i
    while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') i += 1
    if (i == numStart) return nulls
    val objNum = new String(blob, numStart, i - numStart, "US-ASCII")
    // digit boundary: a raw search for "8 0 obj" must not bind to the
    // tail of "18 0 obj" — skip matches whose preceding byte is a digit
    var objAt = indexOf(blob, s"$objNum 0 obj", 0)
    while (objAt > 0 && blob(objAt - 1) >= '0' && blob(objAt - 1) <= '9')
      objAt = indexOf(blob, s"$objNum 0 obj", objAt + 1)
    if (objAt < 0) return nulls
    val endAt = indexOf(blob, "endobj", objAt)
    val end = if (endAt < 0) blob.length else endAt
    def str(key: String): UTF8String = {
      val k = indexOf(blob, key, objAt)
      if (k < 0 || k >= end) return null
      var p = k + key.length
      while (p < end && isWs(blob(p))) p += 1
      if (p >= end || blob(p) != '(') return null
      val (bytes, _) = literalString(blob, p + 1)
      if (bytes == null) null else UTF8String.fromBytes(bytes)
    }
    new GenericArrayData(Array[Any](
      str("/Title"), str("/Author"), str("/CreationDate")))
  }

  /** q141 fixture: the q123 skeleton plus a planted Info object —
    * variants by id%4: full metadata (title exercises the escape
    * decoder), title-only, no Info entry, not a PDF at all.
    */
  def fixtureWithInfo(docId: Long): Array[Byte] = {
    val mm = f"${1 + docId % 12}%02d"
    val dd = f"${1 + docId % 28}%02d"
    val info =
      s"8 0 obj << /Title (T \\($docId\\) esc) /Author (Au $docId) " +
        s"/CreationDate (D:2024$mm${dd}080000Z) >> endobj\n"
    val titleOnly = s"8 0 obj << /Title (T $docId) >> endobj\n"
    ((docId % 4).toInt: @annotation.switch) match {
      case 0 => skeleton(s"BT (Doc $docId) Tj ET".getBytes("UTF-8"),
        flate = false, trailer = "/Info 8 0 R ", extraObjs = info)
      case 1 => skeleton(s"BT (Doc $docId) Tj ET".getBytes("UTF-8"),
        flate = false, trailer = "/Info 8 0 R ", extraObjs = titleOnly)
      case 2 => skeleton(s"BT (Doc $docId) Tj ET".getBytes("UTF-8"),
        flate = false, trailer = "")
      case _ => s"not a pdf $docId".getBytes("UTF-8")
    }
  }

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, false) // zlib wrapper (RFC 1950)
    try {
      d.setInput(data)
      d.finish()
      val bos = new java.io.ByteArrayOutputStream
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    } finally d.end()
  }

  private def skeleton(streamData: Array[Byte], flate: Boolean,
      trailer: String, extraObjs: String = ""): Array[Byte] = {
    val filter = if (flate) "/Filter /FlateDecode " else ""
    val head =
      "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${streamData.length} $filter>> stream\n"
    val tail = s"\nendstream endobj\n$extraObjs" +
      s"trailer << /Root 1 0 R $trailer>>\n%%EOF\n"
    head.getBytes("UTF-8") ++ streamData ++ tail.getBytes("UTF-8")
  }
}
