package graft

import graft.functions.Bm25
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-6 operators: BM25 build/search index split and the decimal
  * overflow guard.
  */
class Round6Spec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark window filter spark spark"),
    (2L, "window merge stream stream"),
    (3L, "filter filter filter customer"),
    (4L, "vector merge vector stream spark"),
    (5L, "customer spark window"),
    (6L, "slow slow filter slow window")
  ).toDF("doc_id", "text")

  private val queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "filter"),
    1L -> Seq("stream", "vector", "slow"),
    2L -> Seq("customer"))

  test("Bm25: searchIndex over a persisted index equals the in-memory topK bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("bm25spec").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val mem = Bm25.topK(corpus, "doc_id", "text", queries, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val idx = Bm25.searchIndex(spark, dir, queries, k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mem.nonEmpty)
    assert(idx == mem)
  }

  test("Bm25: index scan prunes to the query terms' bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("bm25prune").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    // one single-term query → the postings scan must touch exactly the
    // buckets that term hashes into (1), not all written buckets
    val written = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(written > 1, "fixture must spread terms over >1 bucket")
    val plan = Bm25.searchIndex(spark, dir, Seq(0L -> Seq("spark")), k = 3)
      .queryExecution.executedPlan.toString
    // partition pruning shows up as a PartitionFilters entry on the scan
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("bucket"))
  }

  test("Bm25: searchIndex handles query terms absent from the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bm25miss").toString
    Bm25.buildIndex(corpus, "doc_id", "text", dir, nBuckets = 8)
    val got = Bm25.searchIndex(spark, dir,
      Seq(0L -> Seq("spark", "nosuchterm"), 1L -> Seq("zzz")), k = 3)
    val mem = Bm25.topK(corpus, "doc_id", "text",
      Seq(0L -> Seq("spark", "nosuchterm"), 1L -> Seq("zzz")), k = 3)
    assert(got.as[(Long, Long, Long, Long)].collect().toSet ==
      mem.as[(Long, Long, Long, Long)].collect().toSet)
    // query 1 matches nothing → absent, query 0 still ranked
    assert(got.where(col("query_id") === 1L).count() == 0L)
  }

  // ---- SemDedup: semantic dedup over embeddings ---------------------------

  /** Three well-separated direction groups in 8-dim space; groups 0 and 1
    * carry planted near-identical duplicates (cos ≈ 1 within the group,
    * ~0 across groups), group 2 is all-distinct orthogonal-ish vectors.
    */
  private def semCorpus = {
    def v(axis: Int, scale: Float, jitter: Float): Array[Float] = {
      val a = Array.fill(8)(0f); a(axis) = scale; a((axis + 4) % 8) = jitter; a
    }
    Seq(
      (1L, v(0, 1f, 0.01f)), (2L, v(0, 1f, 0.02f)), (3L, v(0, 1f, 0.03f)),
      (10L, v(1, 1f, 0.01f)), (11L, v(1, 1f, 0.02f)),
      (20L, v(2, 1f, 0f)), (21L, v(3, 1f, 0f)), (22L, v(2, 1f, -1f))
    ).toDF("vec_id", "embedding")
  }

  test("SemDedup: planted duplicate groups keep exactly their smallest id") {
    // one centroid per direction group → every planted group co-locates;
    // tests the drop policy in isolation from centroid training
    def axis(cid: Long, a: Int) = {
      val v = Array.fill(8)(0f); v(a) = 1f; (cid, v)
    }
    val cents = Seq(axis(0L, 0), axis(1L, 1), axis(2L, 2), axis(3L, 3))
      .toDF("cid", "c_vec")
    val got = graft.dedup.SemDedup
      .dedupWith(semCorpus, cents, eps = 0.95)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    // group A {1,2,3}: only 1 survives; group B {10,11}: only 10 survives
    assert(got(1L) && !got(2L) && !got(3L))
    assert(got(10L) && !got(11L))
    // distinct vectors all survive (20 vs 22 share an axis but cos < 0.95)
    assert(got(20L) && got(21L) && got(22L))
  }

  test("SemDedup: kept set is byte-identical across partitionings") {
    def run(parts: Int) = graft.dedup.SemDedup
      .dedup(semCorpus.repartition(parts), k = 4, iters = 2, eps = 0.95)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(7))
  }

  test("SemDedup: threshold above 1 keeps everything; centroids are deterministic") {
    val all = graft.dedup.SemDedup
      .dedup(semCorpus, k = 4, iters = 1, eps = 1.5)
      .as[(Long, Long, Boolean)].collect()
    assert(all.length == 8 && all.forall(_._3))
    def cents(parts: Int) = graft.dedup.SemDedup
      .centroids(semCorpus.repartition(parts), k = 4, iters = 2)
      .as[(Long, Array[Float])].collect()
      .map { case (c, v) => c -> v.toSeq }.toMap
    assert(cents(3) == cents(5))
  }

  // ---- SortedNeighborhood -------------------------------------------------

  test("SortedNeighborhood: window pairs within a block only, verified by edit distance") {
    val df = Seq(
      (1L, "b1", "smith"), (2L, "b1", "smyth"), (3L, "b1", "smithe"),
      (4L, "b1", "zzzzz"), // sorts last in b1 — within window of 3 only via 3,4
      (5L, "b2", "smith") // other block: never compared to b1's smiths
    ).toDF("id", "blk", "name")
    val got = graft.etl.SortedNeighborhood.pairs(df,
      col("id"), col("blk"), col("name"), col("name"), w = 3, maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)]
      .collect().toSet
    // b1 sort order: smith(1), smithe(3), smyth(2), zzzzz(4)
    // window-2 pairs: (1,3) d1, (1,2) d1, (3,2) d2, (3,4) d>2, (2,4) d>2
    assert(got == Set((1L, 3L, 1L), (1L, 2L, 1L), (3L, 2L, 2L)))
    // no cross-block pair ever appears
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  // ---- FeatureScale -------------------------------------------------------

  test("FeatureScale: hand-computed min-max basis points; constant group scales to 0") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 35L),
      (4L, "b", 7L), (5L, "b", 7L)).toDF("id", "g", "x")
    val got = graft.etl.FeatureScale
      .minMaxBp(df, col("g"), col("x"), col("id"))
      .select("id", "scaled_bp").as[(Long, Long)].collect().toMap
    // group a: span 25 → 0, (10*10000) div 25 = 4000, 10000
    assert(got == Map(1L -> 0L, 2L -> 4000L, 3L -> 10000L,
      4L -> 0L, 5L -> 0L))
  }

  test("FeatureScale: equal-frequency bins split the remainder to leading buckets") {
    val df = (1L to 10L).map(i => (i, "g", i * 3)).toDF("id", "g", "x")
    val got = graft.etl.FeatureScale
      .equalFreqBins(df, col("g"), col("x"), col("id"), bins = 4)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // 10 rows into 4 bins → sizes 3,3,2,2 in value order
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> 4L, 10L -> 4L))
  }

  // ---- BloomSemiJoin auto-sizing ------------------------------------------

  test("BloomSemiJoin: auto-sized filter stays unsaturated on a dim that would drown the old default") {
    // 50k keys would saturate 2^16 bits (fill ~ 1.0); auto-sizing keeps
    // the fill bounded and the fpp real. Result must equal the plain join
    // regardless (no false negatives).
    val dim = (1L to 50000L).map(i => Tuple1(i * 2)).toDF("k")
    val fact = (1L to 4000L).map(i => Tuple1(i * 25)).toDF("fk")
    val got = graft.etl.BloomSemiJoin
      .filtered(fact, dim, "fk", "k")
      .select("fk").as[Long].collect().sorted
    val plain = fact.join(dim, fact("fk") === dim("k"))
      .select("fk").as[Long].collect().sorted
    assert(got.toSeq == plain.toSeq)
    assert(got.nonEmpty)
  }

  // ---- PitFeatures: point-in-time feature join ----------------------------

  test("PitFeatures: strictly-before frames, hand-computed counts, empty frames zero-fill") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: clicks at 0s/1800s/7200s, view at 10s; labels at 3661s and
    // at exactly 7200s (the same instant as a click — must NOT leak)
    val activity = Seq(
      (1L, ts(0), "click"), (1L, ts(1800), "click"), (1L, ts(7200), "click"),
      (1L, ts(10), "view"),
      (2L, ts(50), "view")
    ).toDF("user_id", "ts", "event_type")
    val labels = Seq(
      (100L, 1L, ts(3661)), (101L, 1L, ts(7200)), (102L, 3L, ts(1000))
    ).toDF("event_id", "user_id", "ts")
    val got = graft.etl.PitFeatures.trailingCounts(
      labels, col("event_id"), col("user_id"), col("ts"),
      activity, col("user_id"), col("ts"), col("event_type"),
      classes = Seq("click", "view"),
      windows = Seq("1h" -> 3600L, "24h" -> 86400L))
      .select("label_id", "click_1h", "view_1h", "click_24h", "view_24h")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // label 100 @3661: 1h frame [61, 3660] → click@1800 only; 24h → 2 clicks, 1 view
    assert(got(100L) == ((1L, 0L, 2L, 1L)))
    // label 101 @7200: the click AT 7200 is excluded (strictly before) —
    // 1h frame [3600, 7199] → none; 24h → clicks at 0 and 1800 only
    assert(got(101L) == ((0L, 0L, 2L, 1L)))
    // label 102: user 3 has no activity at all → zero-filled
    assert(got(102L) == ((0L, 0L, 0L, 0L)))
  }

  // ---- PageRank: deterministic integer ranks ------------------------------

  test("PageRank: two hand-computed iterations on a 3-cycle with a chord") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("s", "d")
    val r = graft.graph.PageRank.ranks(e, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    // r1 = (1000000, 575000, 1425000); second iteration by hand:
    assert(r == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("PageRank: dangling node keeps the teleport base and absorbs mass") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    val r = graft.graph.PageRank.ranks(e, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("PageRank: ranks are bit-identical across partitionings") {
    val edges = (1L to 200L)
      .flatMap(c => Seq((c, math.max(c / 2, 1L)), (c, (c * 7) % 200 + 1)))
      .toDF("s", "d")
    def run(parts: Int) = graft.graph.PageRank
      .ranks(edges.repartition(parts), "s", "d", iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(9))
  }

  // ---- GeometryDim: WKT + bbox geometry sink ------------------------------

  private def ring(pts: (Long, Long)*) =
    pts.map { case (x, y) => (x, y) }

  test("GeometryDim: WKT round-trips the vertex ring exactly") {
    val polys = Seq(
      (1L, ring((0L, 0L), (10L, 0L), (10L, 8L), (0L, 8L))),
      (2L, ring((5L, 5L), (7L, 9L), (3L, 9L)))
    ).toDF("poly_id", "vertices")
      .select(col("poly_id"), col("vertices")
        .cast("array<struct<x:bigint,y:bigint>>").as("vertices"))
    val rt = polys.select(col("poly_id"),
      graft.etl.GeometryDim.fromWkt(
        graft.etl.GeometryDim.toWkt(col("vertices"))).as("back"),
      col("vertices"))
    assert(rt.where(col("back") =!= col("vertices")).count() == 0L)
    val wkt = polys.where(col("poly_id") === 1L)
      .select(graft.etl.GeometryDim.toWkt(col("vertices"))).as[String].head()
    assert(wkt == "POLYGON ((0 0, 10 0, 10 8, 0 8, 0 0))")
  }

  test("GeometryDim: bbox probe pushes min/max predicates to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("geomdim").toString + "/dim"
    val polys = (1L to 50L).map { i =>
      (i, ring((i * 10, i * 5), (i * 10 + 8, i * 5), (i * 10 + 4, i * 5 + 7)))
    }.toDF("poly_id", "vertices")
      .select(col("poly_id"), col("vertices")
        .cast("array<struct<x:bigint,y:bigint>>").as("vertices"))
    graft.etl.GeometryDim.write(polys, "poly_id", col("vertices"), dir)
    val probe = graft.etl.GeometryDim.read(spark, dir,
      bbox = Some((100L, 50L, 120L, 70L)))
    // only polygons whose bbox overlaps the viewport survive
    val ids = probe.select("poly_id").as[Long].collect().sorted
    assert(ids.nonEmpty && ids.forall(i => i * 10 <= 120 && i * 10 + 8 >= 100))
    // and the bbox predicates reached the scan
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("xmin"))
    // round trip through the sink preserves the ring
    val back = graft.etl.GeometryDim.read(spark, dir)
      .select("poly_id", "vertices")
    assert(back.join(polys.withColumnRenamed("vertices", "orig"), "poly_id")
      .where(col("vertices") =!= col("orig")).count() == 0L)
  }

  // ---- MediaHeader: real PNG/JPEG header kernels --------------------------

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private val png800x600 = hexBytes(
    "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000320" + "00000258" + "0806000000" + "DEADBEEF")

  test("MediaHeader: PNG IHDR dims parse big-endian u32") {
    import graft.multimodal.MediaHeader
    assert(MediaHeader.format(png800x600).toString == "png")
    assert(MediaHeader.width(png800x600) == 800)
    assert(MediaHeader.height(png800x600) == 600)
  }

  test("MediaHeader: JPEG SOF dims survive fill bytes, standalone markers and a COM walk") {
    import graft.multimodal.MediaHeader
    // SOI, APP0(JFIF), COM(len 6), RST0 standalone, fill byte, SOF0 1024x768
    val j = hexBytes(
      "FFD8" + "FFE00010" + "4A46494600" + "010200" + "00010001" + "0000" +
        "FFFE0006" + "00000000" + "FFD0" + "FF" +
        "FFC00011" + "08" + "0300" + "0400" +
        "03" + "011100" + "021101" + "031101")
    assert(MediaHeader.format(j).toString == "jpeg")
    assert(MediaHeader.height(j) == 768)
    assert(MediaHeader.width(j) == 1024)
  }

  test("MediaHeader: corrupt and truncated streams yield sentinels, never throws") {
    import graft.multimodal.MediaHeader
    // truncated PNG (signature but no full IHDR)
    val truncPng = png800x600.take(23)
    assert(MediaHeader.format(truncPng) == null)
    assert(MediaHeader.width(truncPng) == -1)
    // PNG whose first chunk is not IHDR
    val notIhdr = png800x600.clone(); notIhdr(12) = 'J'.toByte
    assert(MediaHeader.format(notIhdr) == null)
    // JPEG: EOI before any SOF
    assert(MediaHeader.width(hexBytes("FFD8" + "FFD9")) == -1)
    // JPEG: SOS reached without a SOF
    assert(MediaHeader.width(hexBytes("FFD8" + "FFDA0004" + "0000")) == -1)
    // JPEG: invalid segment length (< 2)
    assert(MediaHeader.width(hexBytes("FFD8" + "FFE00001")) == -1)
    // JPEG: marker sync lost
    assert(MediaHeader.width(hexBytes("FFD8" + "00C00011")) == -1)
    // JPEG: truncated mid-SOF payload
    assert(MediaHeader.width(hexBytes("FFD8" + "FFC00011" + "0803")) == -1)
    // not an image at all / empty / null
    assert(MediaHeader.format("hello".getBytes) == null)
    assert(MediaHeader.width(Array.emptyByteArray) == -1)
    assert(MediaHeader.format(null) == null)
  }

  test("F.imageFormat/Width/Height: codegen path, NULL lifting, null-blob propagation") {
    val df = Seq(
      (1L, png800x600),
      (2L, "not an image".getBytes),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "blob")
    val got = df.select(col("id"),
      graft.functions.F.imageFormat(col("blob")).as("f"),
      graft.functions.F.imageWidth(col("blob")).as("w"),
      graft.functions.F.imageHeight(col("blob")).as("h"))
      .as[(Long, Option[String], Option[Int], Option[Int])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some("png"), Some(800), Some(600)),
      (2L, None, None, None),
      (3L, None, None, None)))
  }

  test("Bm25.guardedDiv: exact integral division on in-range operands") {
    val df = Seq((BigDecimal(7000), BigDecimal(3)))
      .toDF("n", "d")
      .select(col("n").cast(DecimalType(38, 0)).as("n"),
        col("d").cast(DecimalType(38, 0)).as("d"))
    val got = Bm25.guardedDiv(df, "n", "d", "q").select("q")
      .as[Long].collect()
    assert(got.toSeq == Seq(2333L))
  }

  test("Bm25.guardedDiv: a nulled (overflowed) operand raises instead of silently dropping") {
    // non-ANSI decimal overflow manifests as NULL — feed the guard exactly
    // that shape and require a loud failure
    val df = spark.range(1).select(
      lit(null).cast(DecimalType(38, 0)).as("n"),
      lit(3).cast(DecimalType(38, 0)).as("d"))
    val ex = intercept[Exception] {
      Bm25.guardedDiv(df, "n", "d", "q").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("graft.Bm25")))
  }

  test("Bm25: an overflowing score operand fails loudly under the session's decimal mode") {
    // product of two ~1e20 decimals exceeds DECIMAL(38,0): ANSI mode throws
    // at the multiply, non-ANSI nulls and the guard raises — either way the
    // score is never silently wrong
    val big = lit("100000000000000000000").cast(DecimalType(38, 0)) // 1e20
    val df = spark.range(1).select(big.as("a"), big.as("b"))
      .withColumn("n", col("a") * col("b"))
      .withColumn("d", lit(3).cast(DecimalType(38, 0)))
    val ex = intercept[Exception] {
      Bm25.guardedDiv(df, "n", "d", "q").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m =>
      m.contains("graft.Bm25") || m.toLowerCase.contains("overflow") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")))
  }
}
