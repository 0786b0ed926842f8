package graft

import graft.sources.{GraftWarc, WarcCodec}

class WarcSpec extends SparkSpec {

  private def rec(id: Long, warcType: String = "response",
      payload: Array[Byte] = null): Array[Byte] =
    WarcCodec.buildRecord(warcType, s"<urn:t:$id>",
      s"http://x.example/doc/$id", "2024-01-01T00:00:00Z",
      if (payload != null) payload
      else WarcCodec.httpResponse(s"body $id".getBytes("UTF-8")))

  private def parse(bytes: Array[Byte]) =
    WarcCodec.parseStream(new java.io.ByteArrayInputStream(bytes)).toList

  test("WARC build/parse round trip preserves every field") {
    val bytes = rec(1) ++ rec(2, "metadata", "k: v\r\n".getBytes) ++ rec(3)
    val rs = parse(bytes)
    assert(rs.map(_.warcType) == List("response", "metadata", "response"))
    assert(rs.map(_.targetUri) == List(1, 2, 3).map(i => s"http://x.example/doc/$i"))
    assert(rs.map(_.recordId) == List("<urn:t:1>", "<urn:t:2>", "<urn:t:3>"))
    val http = WarcCodec.parseHttp(rs.head.payload)
    assert(http.exists(_._1 == 200))
    assert(new String(http.get._2, "UTF-8") == "body 1")
  }

  test("concatenated-member gzip decodes transparently (the in-the-wild layout)") {
    val bos = new java.io.ByteArrayOutputStream()
    Seq(rec(1), rec(2)).foreach { b =>
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.finish()
    }
    val rs = parse(bos.toByteArray)
    assert(rs.map(_.targetUri) ==
      List("http://x.example/doc/1", "http://x.example/doc/2"))
  }

  test("a torn tail record yields only the complete records before it") {
    val whole = rec(1)
    val torn = rec(2).dropRight(20) // EOF mid-payload
    val rs = parse(whole ++ torn)
    assert(rs.map(_.targetUri) == List("http://x.example/doc/1"))
  }

  test("garbage HTTP payload surfaces as None, never as corpus text") {
    assert(WarcCodec.parseHttp("BROKEN\r\n\r\nnot http".getBytes).isEmpty)
    assert(WarcCodec.parseHttp("HTTP/1.1 OK\r\n\r\nno status int".getBytes).isEmpty)
    assert(WarcCodec.parseHttp("HTTP/1.1 404 Not Found\r\nX: y\r\n\r\nbody".getBytes)
      .map { case (s, b) => (s, new String(b)) }.contains((404, "body")))
    assert(WarcCodec.parseHttp("no terminator at all".getBytes).isEmpty)
  }

  test("a typeless record is skipped without losing stream sync") {
    // hand-build a record missing WARC-Type: parser must skip its payload
    // by Content-Length and continue cleanly into the next record
    val payload = "xx".getBytes
    val headerless = ("WARC/1.0\r\n" +
      "WARC-Record-ID: <urn:t:9>\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("US-ASCII") ++ payload ++ "\r\n\r\n".getBytes
    val rs = parse(headerless ++ rec(1))
    assert(rs.map(_.targetUri) == List("http://x.example/doc/1"))
  }

  test("href/host extraction: absolute https, relative drop, count merge") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Seq(
      (1L, """x <a href="http://a.example/p">u</a> y <a href="https://a.example/q">v</a>"""),
      (2L, """<a href="/relative/only">w</a>"""),
      (3L, """pre <a href="http://b.example">z</a>""")).toDF("doc_id", "html")
    val out = graft.functions.TextStats.outlinkHosts(docs, "doc_id", "html")
      .orderBy("doc_id", "host").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a.example", 2L), (3L, "b.example", 1L)),
      s"got $out — http+https must merge on host, relative links must drop")
  }

  test("GraftWarc.read parses a multi-file dir with plain and gzip archives") {
    val dir = java.nio.file.Files.createTempDirectory("warc_read").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"),
      rec(1) ++ rec(2))
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(rec(3)); g.finish()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.warc.gz"),
      bos.toByteArray)
    val out = GraftWarc.read(spark, s"$dir/*.warc*")
    import org.apache.spark.sql.functions.col
    assert(out.count() == 3)
    assert(out.where(col("http_status") === 200).count() == 3)
    assert(out.select("content_length").where(col("target_uri")
      .endsWith("/doc/1")).head().getLong(0) ==
      WarcCodec.httpResponse("body 1".getBytes).length)
  }
}
