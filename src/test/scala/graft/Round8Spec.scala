package graft

import graft.multimodal.{MediaHeader, PixelCodec}
import org.apache.spark.sql.functions._

/** Round-8 gates: the real pixel decode (PixelCodec — BMP BI_RGB both
  * orientations + both DIB layouts, PNG truecolor with all five filters,
  * CRC verification, multi-IDAT inflate) and the MediaHeader core-header
  * length fix.
  */
class Round8Spec extends SparkSpec {

  import spark.implicits._

  /** The oracle-side arithmetic, mirrored verbatim from the q95 fixture. */
  private def expectedStats(id: Long): Array[Long] = {
    val w = (1 + id % 9).toInt; val h = (1 + id % 7).toInt
    var sr = 0L; var sg = 0L; var sb = 0L; var nz = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val base = id * 7 + y.toLong * 31 + x.toLong * 13
      val r = base % 256; val g = (base + 5) % 256; val b = (base + 10) % 256
      sr += r; sg += g; sb += b
      if (r + g + b > 0) nz += 1
    }
    Array(w.toLong * h, sr, sg, sb, nz)
  }

  test("PixelCodec: BMP and PNG roundtrip matches the doc_id arithmetic") {
    // ids 0..299 cover every (format, orientation, filter-sequence, dims)
    // combination: %3 picks the container, %2 the BMP row order, and
    // (id + y) % 5 walks all five PNG filters
    for (id <- 0L until 300L) {
      val got = PixelCodec.statsRaw(PixelCodec.makeImage(id))
      if (id % 3 == 2) assert(got == null, s"id=$id should be corrupt")
      else assert(got.toSeq == expectedStats(id).toSeq, s"id=$id")
    }
  }

  test("PixelCodec: every PNG filter type appears in the fixture corpus") {
    // (id + y) % 5 with h = 1 + id % 7: any id with h >= 5 covers all
    // five filters within a single image — spot-check one such id decodes
    val id = 4L // %3 == 1 → PNG, h = 1 + 4%7 = 5 → filters 4,0,1,2,3
    assert((1 + id % 7) >= 5)
    assert(PixelCodec.statsRaw(PixelCodec.makeImage(id)) != null)
  }

  test("PixelCodec: CRC damage, truncation, and unsupported variants → null") {
    val png = PixelCodec.makeImage(1L) // a PNG
    // flip one byte inside the first IDAT payload (offset past IHDR):
    // chunk CRC must catch it
    val damaged = png.clone()
    damaged(8 + 25 + 12) = (damaged(8 + 25 + 12) ^ 0x7f).toByte
    assert(PixelCodec.statsRaw(damaged) == null)
    // truncate mid-IDAT
    assert(PixelCodec.statsRaw(java.util.Arrays.copyOf(png, png.length - 20)) == null)
    val bmp = PixelCodec.makeImage(0L)
    assert(PixelCodec.statsRaw(java.util.Arrays.copyOf(bmp, 30)) == null)
    // 16 bpp BMP is out of scope → null, not a throw
    val b16 = bmp.clone(); b16(28) = 16.toByte
    assert(PixelCodec.statsRaw(b16) == null)
    assert(PixelCodec.statsRaw(Array.emptyByteArray) == null)
    assert(PixelCodec.statsRaw(null) == null)
  }

  test("PixelCodec: BITMAPCOREHEADER (12-byte DIB) decodes; MediaHeader accepts 22 bytes") {
    // hand-build a 2×1 core-header BMP: offset 26, u16 dims, 24 bpp,
    // bottom-up; pixels (B,G,R) = (1,2,3) and (4,5,6), stride pads to 8
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0)
    val bb = java.nio.ByteBuffer.allocate(26 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(34).putInt(0).putInt(26)
    bb.putInt(12).putShort(2).putShort(1).putShort(1).putShort(24)
    bb.put(px)
    val core = bb.array()
    assert(PixelCodec.statsRaw(core).toSeq ==
      Seq(2L, 3L + 6, 2L + 5, 1L + 4, 2L))
    // ADVICE r7: a minimal core-header file is valid at 22 bytes — the
    // dims live entirely below that offset
    val min22 = java.util.Arrays.copyOf(core, 22)
    assert(MediaHeader.format(min22) != null &&
      MediaHeader.format(min22).toString == "bmp")
    assert(MediaHeader.width(min22) == 2 && MediaHeader.height(min22) == 1)
    // but a 22-byte INFO-header file is still truncated → rejected
    val info22 = java.util.Arrays.copyOf(PixelCodec.makeImage(0L), 22)
    assert(MediaHeader.format(info22) == null)
  }

  test("q95: fixture round-trips through the engine with NULLs for corrupt ids") {
    val df = SparkEntry.queries("q95_pixel_stats")(spark, sf0001)
    val rows = df.collect()
    assert(rows.length > 0)
    for (r <- rows) {
      val id = r.getLong(0)
      if (id % 3 == 2) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"id=$id should be NULL")
      } else {
        val exp = expectedStats(id)
        assert(r.getString(1) == (if (id % 3 == 0) "bmp" else "png"))
        assert(Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)) == exp.toSeq, s"id=$id")
      }
    }
  }

  // ---- ESRI .shp container parse (q96) ------------------------------------

  test("ShpCodec: single-record roundtrip recovers the fixture ring exactly") {
    for (id <- 0L until 50L) {
      val rs = graft.sources.ShpCodec.ringsRaw(graft.sources.ShpCodec.makeShp(id))
      assert(rs.length == 1)
      val (recno, part, ring) = rs(0)
      assert(recno == 1 && part == 0 && ring.length == 8)
      // mirror of the q85 vertex arithmetic
      val dirs = Seq((1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1),
        (0, -1), (1, -1))
      val exp = dirs.zipWithIndex.map { case ((dx, dy), k) =>
        val r = 50 + (id * 7 + k * 13) % 30
        ((id * 1000 + r * dx).toDouble, (id * 500 + r * dy).toDouble)
      }
      assert(ring.toSeq == exp)
    }
  }

  test("ShpCodec: corruption, truncation, and inconsistency → null") {
    import graft.sources.ShpCodec
    val ok = ShpCodec.makeShp(3L)
    assert(ShpCodec.ringsRaw(ok) != null)
    assert(ShpCodec.ringsRaw(null) == null)
    assert(ShpCodec.ringsRaw(Array.emptyByteArray) == null)
    // truncated mid-record
    assert(ShpCodec.ringsRaw(java.util.Arrays.copyOf(ok, ok.length - 10)) == null)
    // bad file code
    val badCode = ok.clone(); badCode(0) = 0x12
    assert(ShpCodec.ringsRaw(badCode) == null)
    // damage the closing duplicate point: ring no longer closed —
    // spec-mandated closure reject
    val badClose = ok.clone()
    badClose(ok.length - 4) = (badClose(ok.length - 4) ^ 0x3f).toByte
    assert(ShpCodec.ringsRaw(badClose) == null)
    // damage an extreme coordinate (first point's x): the record bbox no
    // longer agrees with its points — internal-consistency reject
    val badPt = ok.clone(); badPt(156 + 6) = (badPt(156 + 6) ^ 0x3f).toByte
    assert(ShpCodec.ringsRaw(badPt) == null)
    // unsupported shape type (1 = Point) in the record body
    val badType = ok.clone(); badType(108) = 1
    assert(ShpCodec.ringsRaw(badType) == null)
  }

  test("GraftShp.read: multi-record file ingest via a binaryFile task") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shp").toFile
    try {
      val ids = Array(0L, 3L, 7L, 11L)
      java.nio.file.Files.write(new java.io.File(dir, "fix.shp").toPath,
        graft.sources.ShpCodec.makeShpFile(ids))
      val rows = graft.sources.GraftShp.read(spark, dir.getAbsolutePath + "/*.shp")
        .orderBy("recno").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
      // ring of record 2 (ids(1) = 3) matches the single-record parse
      val viaFile = rows(1).getSeq[org.apache.spark.sql.Row](3)
        .map(r => (r.getLong(0), r.getLong(1)))
      val direct = graft.sources.ShpCodec.ringsRaw(
        graft.sources.ShpCodec.makeShp(3L))(0)._3
        .map { case (x, y) => (x.toLong, y.toLong) }.toSeq
      assert(viaFile == direct)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("q96: parsed WKT is byte-identical to the q85 fixture path") {
    val q96 = SparkEntry.queries("q96_shapefile")(spark, sf0001)
      .select("poly_id", "wkt", "xmin", "ymin", "xmax", "ymax")
    val q85 = SparkEntry.queries("q85_geometry_dim")(spark, sf0001)
    assert(q96.count() > 0)
    assert(q96.exceptAll(q85).isEmpty && q85.exceptAll(q96).isEmpty)
  }

  // ---- density-controlled scale generator (the pair-family probe) ---------

  test("ScaleGen maxClique mode: near-dup structure is clique-bounded") {
    val out = java.nio.file.Files.createTempDirectory("graft_scalegen").toString
    try {
      // factor 4, cliques of 2 → every base row yields TWO disjoint
      // 2-cliques instead of one 4-clique
      ScaleGen.generate(spark, sf0001, 4, out, maxClique = 2)
      val docs = spark.read.parquet(s"$out/documents.parquet")
        .where(col("doc_id") < 40).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      def bigrams(s: String) =
        s.split("\\s+").sliding(2).map(_.mkString(" ")).toSet
      def jac(a: Set[String], b: Set[String]) =
        a.intersect(b).size.toDouble / a.union(b).size
      for (base <- 0L until 10L) {
        val Seq(r0, r1, r2, r3) = (0L until 4L).map(r => docs(base * 4 + r))
        // within-clique (replicas {0,1} and {2,3}): near-dup
        assert(jac(bigrams(r0), bigrams(r1)) > 0.5, s"base=$base within")
        assert(jac(bigrams(r2), bigrams(r3)) > 0.5, s"base=$base within")
        // cross-clique: group-tagged even positions kill every bigram
        assert(jac(bigrams(r0), bigrams(r2)) < 0.05, s"base=$base cross")
      }
      val emb = spark.read.parquet(s"$out/embeddings.parquet")
        .where(col("vec_id") < 40).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
        .toMap
      def cos(a: Array[Double], b: Array[Double]) = {
        val dot = a.zip(b).map(p => p._1 * p._2).sum
        dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      }
      for (base <- 0L until 10L) {
        val Seq(v0, v1, v2, v3) = (0L until 4L).map(r => emb(base * 4 + r))
        assert(cos(v0, v1) > 0.99, s"base=$base within")
        assert(cos(v2, v3) > 0.99, s"base=$base within")
        assert(math.abs(cos(v0, v2)) < 0.5, s"base=$base cross")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("q95: decode runs inside whole-stage codegen (StaticInvoke, no UDF)") {
    val df = SparkEntry.queries("q95_pixel_stats")(spark, sf0001)
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("static_invoke(graft.multimodal.PixelCodec.stats"))
    // the *(n) prefix marks a WholeStageCodegen span in simple-string form
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      plan.take(1200))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"))
  }
}
