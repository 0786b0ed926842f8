package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One parsed WARC record. `warcDate` is the WARC-Date header as a UTC
  * instant; `httpStatus`/`body` are null unless the record is an HTTP
  * response whose payload parses (see [[WarcCodec.parseHttp]]).
  */
final case class WarcRow(file: String, warc_type: String, record_id: String,
    target_uri: String, warc_date: java.sql.Timestamp, content_length: Long,
    http_status: Option[Int], body: Array[Byte])

/** WARC (Web ARChive, ISO 28500 — the Common Crawl container) ingest.
  *
  * Reference scope note: the reference pipeline ingests ZIP'd CSV
  * (aggregates_python_helpers.py:22-31); WARC is the corresponding wire
  * format for the LLM-training-corpus side of this engine — the format
  * web-scale text actually arrives in — so it gets the same treatment as
  * the ZIP/SHP containers: a from-spec parser, a deterministic fixture,
  * and a full fixture-arithmetic oracle (q97).
  *
  * Scale shape — identical contract to [[GraftCsv.readZip]]: a WARC file
  * is a concatenation of length-prefixed records (optionally gzip'd as
  * concatenated members, which GZIPInputStream walks natively), so the
  * container is NOT block-splittable; parallelism = number of archives —
  * one task streams one archive end-to-end in constant memory (records
  * stream through an iterator; nothing buffers more than one record).
  * Common Crawl ships ~1 GB segments by the tens of thousands, so
  * file-count parallelism is the natural sharding; a single multi-TB
  * archive is the same anti-pattern as a single giant ZIP (re-land it as
  * parquet once, at ingest).
  */
object GraftWarc {

  /** (file, warc_type, record_id, target_uri, warc_date, content_length,
    * http_status, body) for every record under `path` (glob ok). Filter
    * `warc_type = 'response'` and non-null `body` for corpus text.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path).flatMap { case (file, pds) =>
      WarcCodec.parseStream(pds.open()).map { r =>
        val http = if (r.warcType == "response") WarcCodec.parseHttp(r.payload)
          else None
        WarcRow(file, r.warcType, r.recordId, r.targetUri,
          java.sql.Timestamp.from(java.time.Instant.parse(r.warcDate)),
          r.payload.length.toLong,
          http.map(_._1), http.map(_._2).orNull)
      }
    }.toDS().toDF()
  }
}

object WarcCodec {

  final case class Rec(warcType: String, recordId: String, targetUri: String,
      warcDate: String, payload: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Assemble one WARC/1.0 record (the fixture/test encoder — also the
    * documentation of exactly what [[parseStream]] expects).
    */
  def buildRecord(warcType: String, recordId: String, targetUri: String,
      warcDate: String, payload: Array[Byte]): Array[Byte] = {
    val header = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $warcType\r\n")
      .append(s"WARC-Record-ID: $recordId\r\n")
      .append(s"WARC-Date: $warcDate\r\n")
      .append(s"WARC-Target-URI: $targetUri\r\n")
      .append(s"Content-Length: ${payload.length}\r\n")
      .append("\r\n")
      .toString.getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + payload.length + 4)
    out.write(header); out.write(payload)
    out.write(Crlf); out.write(Crlf) // record separator (spec §4)
    out.toByteArray
  }

  /** An HTTP/1.1 200 text/plain response payload around `body` — the
    * canonical response-record payload the fixture plants.
    */
  def httpResponse(body: Array[Byte]): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain\r\n\r\n").getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(head.length + body.length)
    out.write(head); out.write(body)
    out.toByteArray
  }

  /** Split an HTTP response payload into (status, body bytes). None when
    * the payload doesn't start with an HTTP status line or has no header
    * terminator — a torn/garbage capture must surface as null, never as
    * corpus text.
    */
  def parseHttp(payload: Array[Byte]): Option[(Int, Array[Byte])] = {
    val headEnd = indexOfDoubleCrlf(payload)
    if (headEnd < 0) return None
    val statusLine = new String(payload, 0, math.min(headEnd, 256), "US-ASCII")
      .takeWhile(_ != '\r')
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val status = try parts(1).toInt catch { case _: NumberFormatException => return None }
    Some((status, java.util.Arrays.copyOfRange(payload, headEnd + 4, payload.length)))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Stream-parse concatenated WARC records. Gzip is sniffed from the
    * magic bytes (concatenated gzip members — the per-record compression
    * WARC files use in the wild — decode transparently through
    * GZIPInputStream). A torn tail record (EOF before Content-Length
    * bytes arrive) ends the iterator after the last complete record —
    * the exactly-once sink contract upstream re-lands torn files whole.
    */
  def parseStream(raw: java.io.InputStream): Iterator[Rec] = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(raw, 1 << 16), 2)
    val b0 = pb.read(); val b1 = pb.read()
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val in: java.io.InputStream =
      if (b0 == 0x1f && b1 == 0x8b)
        new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(pb, 1 << 16), 1 << 16)
      else pb

    // byte-wise line reader: BufferedReader would over-read past the
    // header block into the binary payload
    def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var c = in.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') { sb.append(c.toChar); c = in.read() }
      val s = sb.toString
      if (s.nonEmpty && s.charAt(s.length - 1) == '\r')
        s.substring(0, s.length - 1) else s
    }

    def readFully(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val k = in.read(buf, off, n - off)
        if (k < 0) return null // torn tail
        off += k
      }
      buf
    }

    new Iterator[Rec] {
      private var nextRec: Rec = advance()

      @annotation.tailrec
      private def advance(): Rec = {
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) return null
        if (!line.startsWith("WARC/")) return null // lost sync: stop
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0)
            headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine()
        }
        if (h == null) return null
        val len = headers.get("content-length").flatMap(s =>
          try Some(s.toInt) catch { case _: NumberFormatException => None })
        len match {
          case None => null // unframeable: cannot skip an unknown length
          case Some(n) =>
            val payload = readFully(n)
            if (payload == null) null
            else headers.get("warc-type") match {
              case Some(t) => Rec(t,
                headers.getOrElse("warc-record-id", ""),
                headers.getOrElse("warc-target-uri", ""),
                headers.getOrElse("warc-date", "1970-01-01T00:00:00Z"),
                payload)
              case None => advance() // typeless record: skip, stay in sync
            }
        }
      }

      def hasNext: Boolean = nextRec != null
      def next(): Rec = { val r = nextRec; nextRec = advance(); r }
    }
  }
}
