package graft

import graft.sources.PdfText
import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level coverage for the bounded-subset PDF extractor — q123's
  * oracle proves the fixture round trip at corpus scale; these pin the
  * spec corners the fixture reaches only in aggregate: the literal-string
  * escape set, hex strings, TJ kerning, /Length handling, stream
  * skipping, and every soft-failure reason.
  */
class PdfTextSpec extends SparkSpec {

  private def ex(b: Array[Byte]): (String, String) = PdfText.extractText(b)

  private def pdf(content: String, flate: Boolean = false,
      trailer: String = ""): Array[Byte] = {
    val data =
      if (!flate) content.getBytes("UTF-8")
      else {
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(content.getBytes("UTF-8")); d.finish()
        val bos = new java.io.ByteArrayOutputStream
        val buf = new Array[Byte](8192)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end(); bos.toByteArray
      }
    val filter = if (flate) "/Filter /FlateDecode " else ""
    (s"%PDF-1.7\n4 0 obj << /Length ${data.length} $filter>> stream\n")
      .getBytes("UTF-8") ++ data ++
      (s"\nendstream endobj\ntrailer << /Root 1 0 R $trailer>>\n%%EOF\n")
        .getBytes("UTF-8")
  }

  test("fixture round trip: all five variants answer their contract") {
    val t = UTF8String.fromString("hello (world) \\ two\nlines")
    assert(ex(PdfText.fixture(0L, t)) ==
      (("Doc 0 uncompressed\nhello (world) \\ two\nlines", "ok")))
    assert(ex(PdfText.fixture(1L, t)) ==
      (("Doc 1 flate\nhello (world) \\ two\nlines", "ok")))
    assert(ex(PdfText.fixture(2L, t)) == ((null, "encrypted")))
    assert(ex(PdfText.fixture(3L, t)) == ((null, "torn")))
    assert(ex(PdfText.fixture(4L, t)) == ((null, "no_text")))
    // a NULL doc text builds an empty planted string, not a throw
    assert(ex(PdfText.fixture(0L, null)) == (("Doc 0 uncompressed\n", "ok")))
  }

  test("literal-string escapes: octal, named, continuation, nesting") {
    val (txt, r) = ex(pdf(
      "BT (\\110\\151! \\(nested (deep) ok\\) tab\\there\\\n joined) Tj ET"))
    assert(r == "ok")
    assert(txt == "Hi! (nested (deep) ok) tab\there joined")
  }

  test("hex strings decode pairs and pad an odd final nibble") {
    // 48 65 6C 6C 6F = Hello; <7> pads to 0x70 = p
    val (txt, r) = ex(pdf("BT <48656C6C6F> Tj T* <7> Tj ET"))
    assert(r == "ok" && txt == "Hello\np")
  }

  test("TJ shows its strings and ignores kerning numbers") {
    val (txt, r) = ex(pdf("BT [(A) -120 (B) 3.5 (C)] TJ ET"))
    assert(r == "ok" && txt == "ABC")
  }

  test("quote operators and Td/TD/T* start new lines; ET drops operands") {
    val (txt, r) = ex(pdf(
      "BT (one) Tj 0 -10 TD (two) Tj (three) ' ET BT (four) Tj ET"))
    assert(r == "ok" && txt == "one\ntwo\nthree\nfour")
  }

  test("strings outside BT...ET never emit; names and numbers pass through") {
    val (txt, r) = ex(pdf("(orphan) Tj BT /F1 12 Tf (kept) Tj ET"))
    assert(r == "ok" && txt == "kept")
  }

  test("indirect /Length falls back to the endstream scan") {
    val body = "BT (indirect) Tj ET"
    val b = (s"%PDF-1.7\n5 0 obj << /Length 6 0 R >> stream\n$body" +
      "\nendstream endobj\n%%EOF\n").getBytes("UTF-8")
    assert(ex(b) == (("indirect", "ok")))
  }

  test("/Subtype /Image streams are skipped, not scanned as text") {
    val img = "7 0 obj << /Subtype /Image /Length 12 >> stream\n" +
      "BT (pix) Tj E\nendstream endobj\n"
    val txt = "8 0 obj << /Length 16 >> stream\nBT (real) Tj ET\n" +
      "endstream endobj\n"
    val b = ("%PDF-1.7\n" + img + txt + "%%EOF\n").getBytes("UTF-8")
    assert(ex(b) == (("real", "ok")))
  }

  test("image skip needs the COMBINED /Subtype/Image name, not substrings") {
    // /ImageMask key + an unrelated /Subtype: text-bearing, must scan
    val mask = "7 0 obj << /Subtype /Form /ImageMask true /Length 14 >> " +
      "stream\nBT (kept) Tj ET\nendstream endobj\n"
    val b1 = ("%PDF-1.7\n" + mask + "%%EOF\n").getBytes("UTF-8")
    assert(ex(b1) == (("kept", "ok")),
      "/ImageMask beside an unrelated /Subtype must not skip the stream")
    // a NAME containing 'Image' (here /MyImage) plus any /Subtype
    val named = "7 0 obj << /Subtype /Form /Name /MyImage /Length 14 >> " +
      "stream\nBT (also) Tj ET\nendstream endobj\n"
    val b2 = ("%PDF-1.7\n" + named + "%%EOF\n").getBytes("UTF-8")
    assert(ex(b2) == (("also", "ok")))
    // no-space /Subtype/Image still skips; so does /Subtype /Image/Next
    val tight = "7 0 obj << /Subtype/Image /Length 12 >> stream\n" +
      "BT (pix) Tj E\nendstream endobj\n" +
      "8 0 obj << /Length 14 >> stream\nBT (text) Tj ET\nendstream endobj\n"
    val b3 = ("%PDF-1.7\n" + tight + "%%EOF\n").getBytes("UTF-8")
    assert(ex(b3) == (("text", "ok")))
  }

  test("soft failures: not_pdf, torn stream, failed inflate, encrypted") {
    assert(ex(null) == ((null, "not_pdf")))
    assert(ex("hello".getBytes("UTF-8")) == ((null, "not_pdf")))
    assert(ex("%PDF-1.7\n1 0 obj << >> stream\nnever ends"
      .getBytes("UTF-8")) == ((null, "torn")))
    // valid framing, garbage where zlib bytes should be
    val bad = ("%PDF-1.7\n1 0 obj << /Length 9 /Filter /FlateDecode >> " +
      "stream\nnot-zlib!\nendstream\n%%EOF\n").getBytes("UTF-8")
    assert(ex(bad) == ((null, "torn")))
    assert(ex(pdf("BT (x) Tj ET", trailer = "/Encrypt 9 0 R ")) ==
      ((null, "encrypted")))
    // ... but '/Encrypt' INSIDE a stream body is data, not a dict key
    assert(ex(pdf("BT (/Encrypt is prose here) Tj ET")) ==
      (("/Encrypt is prose here", "ok")))
  }

  test("multiple content streams concatenate with a line break") {
    val s1 = "2 0 obj << /Length 14 >> stream\nBT (a) Tj ET\n\nendstream\n"
    val s2 = "3 0 obj << /Length 14 >> stream\nBT (b) Tj ET\n\nendstream\n"
    val b = ("%PDF-1.7\n" + s1 + s2 + "%%EOF\n").getBytes("UTF-8")
    assert(ex(b) == (("a\nb", "ok")))
  }

  // ---- Info-dictionary metadata (q141) -------------------------------------

  private def info(b: Array[Byte]): (String, String, String) = {
    val a = graft.sources.PdfText.infoMeta(b)
    def g(i: Int) =
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString
    (g(0), g(1), g(2))
  }

  test("info metadata: escape decoding, partial dicts, soft NULLs") {
    assert(info(graft.sources.PdfText.fixtureWithInfo(4L)) ==
      (("T (4) esc", "Au 4", "D:20240505080000Z")))
    assert(info(graft.sources.PdfText.fixtureWithInfo(1L)) ==
      (("T 1", null, null)), "title-only dict")
    assert(info(graft.sources.PdfText.fixtureWithInfo(2L)) ==
      ((null, null, null)), "no /Info in trailer")
    assert(info(graft.sources.PdfText.fixtureWithInfo(3L)) ==
      ((null, null, null)), "not a PDF")
    assert(info(null) == ((null, null, null)))
  }

  test("info metadata: the LAST trailer wins (incremental update)") {
    val b = ("%PDF-1.4\n" +
      "7 0 obj << /Title (old) >> endobj\n" +
      "8 0 obj << /Title (new) >> endobj\n" +
      "trailer << /Root 1 0 R /Info 7 0 R >>\n" +
      "trailer << /Root 1 0 R /Info 8 0 R >>\n%%EOF\n").getBytes("UTF-8")
    assert(info(b)._1 == "new")
  }

  test("info metadata: object lookup honors the digit boundary") {
    // /Info 8 0 R must bind to "8 0 obj", never the tail of "18 0 obj"
    val b = ("%PDF-1.4\n" +
      "18 0 obj << /Title (wrong) >> endobj\n" +
      "8 0 obj << /Title (right) >> endobj\n" +
      "trailer << /Root 1 0 R /Info 8 0 R >>\n%%EOF\n").getBytes("UTF-8")
    assert(info(b)._1 == "right")
    // and a ref whose object is entirely absent stays NULL
    val missing = ("%PDF-1.4\n" +
      "18 0 obj << /Title (wrong) >> endobj\n" +
      "trailer << /Root 1 0 R /Info 8 0 R >>\n%%EOF\n").getBytes("UTF-8")
    assert(info(missing) == ((null, null, null)))
  }

  test("info metadata: an indirect string value is out of subset -> NULL") {
    val b = ("%PDF-1.4\n" +
      "8 0 obj << /Title 9 0 R /Author (direct) >> endobj\n" +
      "trailer << /Root 1 0 R /Info 8 0 R >>\n%%EOF\n").getBytes("UTF-8")
    assert(info(b) == ((null, "direct", null)))
  }
}
