package graft

import graft.sources.{ContentRoute, WarcCodec}
import org.apache.spark.sql.functions._

/** Kernel-level coverage for Content-Type payload routing — q111's
  * oracle proves the composition over the planted mixed-type archive;
  * these pin the dispatch table and the per-route output contract one
  * case at a time.
  */
class ContentRouteSpec extends SparkSpec {
  import spark.implicits._

  private def routeOf(ct: String): String =
    spark.range(1).select(ContentRoute.route(lit(ct)).as("r"))
      .collect()(0).getString(0)

  test("dispatch table: html/plain/image/pdf/binary/unknown") {
    assert(routeOf("text/html") == "html")
    assert(routeOf("text/html; charset=utf-8") == "html")
    assert(routeOf("application/xhtml+xml") == "html")
    assert(routeOf("TEXT/HTML") == "html") // media types case-fold
    assert(routeOf("text/plain") == "plain")
    assert(routeOf("text/csv; header=present") == "plain")
    assert(routeOf("image/png") == "image")
    assert(routeOf("image/bmp") == "image")
    assert(routeOf("application/pdf") == "pdf")
    assert(routeOf("application/rss+xml") == "feed")
    assert(routeOf("application/atom+xml; charset=utf-8") == "feed")
    assert(routeOf("application/json") == "binary")
    assert(routeOf("video/mp4") == "binary")
    assert(routeOf("") == "unknown")
    assert(routeOf("  ") == "unknown")
    val nullRoute = spark.range(1)
      .select(ContentRoute.route(lit(null).cast("string")).as("r"))
      .collect()(0).getString(0)
    assert(nullRoute == "unknown")
  }

  test("mediaType drops parameters, trims, folds case, nulls empties") {
    def mt(ct: String): String = {
      val r = spark.range(1)
        .select(ContentRoute.mediaType(lit(ct)).as("m")).collect()(0)
      if (r.isNullAt(0)) null else r.getString(0)
    }
    assert(mt("Text/HTML; charset=UTF-8") == "text/html")
    assert(mt(" text/plain ") == "text/plain")
    assert(mt(";charset=utf-8") == null)
    assert(mt("") == null)
  }

  test("routed: per-route outputs — extract, transcode, header parse, skip") {
    val bmp = Array[Byte]('B', 'M') ++ Array.fill[Byte](8)(0) ++
      Array[Byte](0x36, 0, 0, 0, 40, 0, 0, 0, 7, 0, 0, 0, 5, 0, 0, 0,
        1, 0, 24, 0)
    val rows = Seq(
      (1L, "text/html; charset=utf-8",
        "<html><body><p>Hello &amp; welcome</p></body></html>"
          .getBytes("UTF-8")),
      (2L, "text/plain; charset=iso-8859-1", "café".getBytes("ISO-8859-1")),
      (3L, "image/bmp", bmp),
      (4L, "application/pdf", "%PDF-1.4".getBytes("US-ASCII")),
      (5L, null.asInstanceOf[String], Array[Byte](1, 2, 3)),
      // mislabeled prose: declared charset rejects the bytes → text NULL
      (6L, "text/plain; charset=utf-8", Array[Byte](-1, -2, 65)),
      // a REAL planted PDF (variant 0: uncompressed Tj): the route runs
      // the q123 extractor, not a skip
      (7L, "application/pdf", graft.sources.PdfText.fixture(10L,
        org.apache.spark.unsafe.types.UTF8String.fromString("hi"))))
      .toDF("doc_id", "content_type", "body")
    val out = ContentRoute.routed(rows)
      .select("doc_id", "route", "text", "img_format", "img_w", "img_h",
        "pdf_reason")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2),
          if (r.isNullAt(3)) null else r.getString(3),
          if (r.isNullAt(4)) -1 else r.getInt(4),
          if (r.isNullAt(5)) -1 else r.getInt(5),
          if (r.isNullAt(6)) null else r.getString(6))).toMap
    assert(out(1L) == (("html", "Hello & welcome", null, -1, -1, null)))
    assert(out(2L) == (("plain", "café", null, -1, -1, null)))
    assert(out(3L) == (("image", null, "bmp", 7, 5, null)))
    assert(out(4L) == (("pdf", null, null, -1, -1, "no_text")),
      "an object-less PDF marker must answer no_text, not mangled prose")
    assert(out(5L) == (("unknown", null, null, -1, -1, null)))
    assert(out(6L) == (("plain", null, null, -1, -1, null)),
      "strict transcode must reject mislabeled bytes, not mangle them")
    assert(out(7L) == (("pdf", "Doc 10 uncompressed\nhi", null, -1, -1, "ok")))
    // every input row survives: routing classifies, callers filter
    assert(out.size == 7)
  }

  test("feed route: item count surfaces, text stays NULL") {
    val rss = ("<?xml version=\"1.0\"?><rss><channel><title>F</title>" +
      "<item><title>a</title></item><item><title>b</title></item>" +
      "</channel></rss>").getBytes("UTF-8")
    val atom = ("<?xml version=\"1.0\"?><feed><entry/><entry/><entry/>" +
      "</feed>").getBytes("UTF-8")
    val out = ContentRoute.routed(Seq(
      (1L, "application/rss+xml", rss),
      (2L, "application/atom+xml", atom)).toDF("doc_id", "content_type",
      "body"))
      .select("doc_id", "route", "text", "feed_item_count")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) null else r.getString(2),
          r.getLong(3))).toMap
    assert(out(1L) == (("feed", null, 2L)))
    assert(out(2L) == (("feed", null, 3L)),
      "self-closing <entry/> tags must count")
  }

  test("routing composes with the WARC reader's absent-header NULL") {
    val noCt = ("HTTP/1.1 200 OK\r\nX-Graft: untyped\r\n\r\n")
      .getBytes("US-ASCII") ++ "body".getBytes("UTF-8")
    val rec = WarcCodec.buildRecord("response", "<urn:t:1>",
      "http://x.example/doc/1", "2024-01-01T00:00:00Z", noCt)
    val dir = java.nio.file.Files.createTempDirectory("ctroute").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"), rec)
    val out = ContentRoute.routed(
      graft.sources.GraftWarc.read(spark, s"$dir/a.warc")
        .where(col("warc_type") === "response"))
      .select("route").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("unknown"))
  }
}
