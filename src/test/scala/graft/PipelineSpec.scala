package graft

import org.apache.spark.sql.functions._

/** Composition laws for the end-to-end corpus-prep funnel: each stage's
  * operator is individually gated elsewhere; here we assert the CHAIN
  * behaves — monotone survivor sets, planted drops at the right stage,
  * pack-exactly-once, and partitioning-independence.
  */
class PipelineSpec extends SparkSpec {

  import spark.implicits._

  private val base =
    "the quick brown fox and the lazy dog sit on the mat in the sun"
  private val docs = Seq(
    (1L, base),
    (2L, base), // exact duplicate → drops at exact dedup
    (3L, base.replace("lazy", "sleepy")), // near-dup → cluster keeper is 1
    (4L, "der hund und die katze sind nicht hier heute"), // German → gated
    (5L, "alpha beta gamma delta and the epsilon zeta eta theta iota kappa"),
    (6L, "many colorful birds fly over the tall green trees in the morning")
  ).toDF("doc_id", "text")
  // doc 5 is verbatim in the benchmark set → drops at decontamination
  private val bench = Seq(
    (100L, "alpha beta gamma delta and the epsilon zeta eta theta iota kappa")
  ).toDF("bench_id", "text")

  test("corpus prep funnel drops each planted doc at its stage and packs survivors once") {
    val prep = Pipeline.prepareCorpus(docs, "doc_id", "text",
      bench, "bench_id", "text")
    val funnel = prep.funnel.as[(String, Long)].collect().toMap
    assert(funnel == Map(
      "0_raw" -> 6L, "1_gated" -> 5L, "2_exact_dedup" -> 4L,
      "3_near_dedup" -> 3L, "4_decontaminated" -> 2L, "5_packed" -> 2L))
    val packedIds = prep.packed.select("doc_id").as[Long].collect().sorted
    assert(packedIds.toSeq == Seq(1L, 6L))
    // every packed doc appears exactly once and within budget
    val perSeq = prep.packed.groupBy("seq_id")
      .agg(sum("n_tokens").as("t")).as[(Long, Long)].collect()
    assert(perSeq.forall(_._2 <= 512L))
  }

  test("corpus prep is deterministic across partitionings") {
    def run(parts: Int) = Pipeline.prepareCorpus(
      docs.repartition(parts), "doc_id", "text",
      bench, "bench_id", "text")
      .packed.as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(5))
  }

  test("image gate drops corrupt blobs and metadata rides through packing") {
    def hx(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val okGif = hx("474946383961" + "0800" + "0600" + "F70000") // 8×6
    val images = Seq(
      (1L, okGif), (2L, okGif), (3L, okGif), (4L, okGif), (5L, okGif),
      (6L, hx("DEADBEEF")) // doc 6: corrupt container → image gate drop
    ).toDF("doc_id", "blob")
    val prep = Pipeline.prepareCorpus(docs, "doc_id", "text",
      bench, "bench_id", "text", images = Some(images))
    val funnel = prep.funnel.as[(String, Long)].collect().toMap
    // doc 4 drops at the language gate, doc 6 at the image gate, then
    // the text chain proceeds exactly as before over {1,2,3,5}
    assert(funnel == Map(
      "0_raw" -> 6L, "1_gated" -> 5L, "1b_image_gate" -> 4L,
      "2_exact_dedup" -> 3L, "3_near_dedup" -> 2L,
      "4_decontaminated" -> 1L, "5_packed" -> 1L))
    // the survivor carries its parsed image metadata on the packed rows
    val packed = prep.packed
      .select("doc_id", "img_format", "img_w", "img_h")
      .as[(Long, String, Int, Int)].collect().toSeq
    assert(packed == Seq((1L, "gif", 8, 6)))
    // undersized images are gated too: an 8-wide GIF fails minImageW=9
    val none = Pipeline.prepareCorpus(docs, "doc_id", "text",
      bench, "bench_id", "text", images = Some(images), minImageW = 9)
      .funnel.as[(String, Long)].collect().toMap
    assert(none("1b_image_gate") == 0L && none("5_packed") == 0L)
    prep.release() // the cached stage frames free without error
  }

  test("web funnel composes ingest → transcode → encoding gate ahead of the text chain") {
    import graft.sources.{GraftWarc, WarcCodec}
    import org.apache.spark.sql.functions.{col, regexp_extract}
    // 6 captures: 1-3 clean UTF-8, 4 ISO-8859-1 (must transcode, then
    // survive), 5 unknown charset (drops at transcode), 6 well-labeled
    // but carrying a stray BEL (survives transcode, drops at the
    // encoding gate) — plus one torn record (excluded from w0 entirely)
    val t = "the quick brown fox jumps over the lazy dog and then the " +
      "fox naps on the warm stone all day"
    def cap(id: Long, body: Array[Byte], ctype: String) =
      WarcCodec.buildRecord("response", s"<urn:p:$id>",
        s"http://x.example/doc/$id", "2024-01-01T00:00:00Z",
        WarcCodec.httpResponse(body, ctype))
    val bytes =
      cap(1, t.getBytes("UTF-8"), "text/plain") ++
      cap(2, (t + " extra").getBytes("UTF-8"), "text/plain") ++
      cap(3, (t + " café").getBytes("ISO-8859-1"),
        "text/plain; charset=iso-8859-1") ++
      cap(4, t.getBytes("UTF-8"), "text/plain; charset=x-nope") ++
      cap(5, (t + " \u0007bel").getBytes("UTF-8"),
        "text/plain; charset=utf-8") ++
      // a PDF capture: routes INTO the text chain (q123's extractor
      // inside the funnel), but an object-less marker yields NULL text
      // and drops before w2 — counted, never mangled through a text
      // kernel
      cap(7, "%PDF-1.4 not prose".getBytes("US-ASCII"),
        "application/pdf") ++
      // an html page whose robots meta opts out: routes into the text
      // chain, drops at w2 (q125's noindex gate inside the funnel)
      cap(8, ("<html><head><meta name=\"robots\" content=\"noindex\">" +
        s"</head><body><p>$t</p></body></html>").getBytes("UTF-8"),
        "text/html; charset=utf-8") ++
      cap(6, t.getBytes("UTF-8"), "text/plain").dropRight(30) // torn
    val dir = java.nio.file.Files.createTempDirectory("webfunnel").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.warc"), bytes)
    val prep = Pipeline.prepareWebCorpus(
      GraftWarc.read(spark, s"$dir/a.warc"),
      docId = regexp_extract(col("target_uri"), "/doc/([0-9]+)$", 1),
      bench = Seq.empty[(Long, String)].toDF("bench_id", "text"),
      benchId = "bench_id", benchText = "text")
    val funnel = prep.funnel.as[(String, Long)].collect().toMap
    assert(funnel("w0_records") == 7L, s"torn record must not count: $funnel")
    assert(funnel("w1_http_bodies") == 7L)
    assert(funnel("w1b_text_routed") == 7L,
      s"the PDF capture must route into the text chain: $funnel")
    assert(funnel("w2_transcoded") == 4L,
      s"unknown charset, textless PDF and noindex page must drop: $funnel")
    assert(funnel("0_raw") == 3L, s"BEL capture must drop at the gate: $funnel")
    // docs 1/2/3 proceed: all-distinct exact, 1-2-3 mutually near-dup at
    // bigram J >= 50 (tail edits only) → one keeper
    assert(funnel("2_exact_dedup") == 3L && funnel("3_near_dedup") == 1L &&
      funnel("5_packed") == 1L, s"$funnel")
    // the transcoded ISO body decodes to real é, never mojibake
    prep.release()
  }

  test("empty benchmark set skips decontamination without dropping anything") {
    val noBench = Seq.empty[(Long, String)].toDF("bench_id", "text")
    val prep = Pipeline.prepareCorpus(docs, "doc_id", "text",
      noBench, "bench_id", "text")
    val funnel = prep.funnel.as[(String, Long)].collect().toMap
    assert(funnel("4_decontaminated") == 3L) // doc 5 survives now
  }
}
