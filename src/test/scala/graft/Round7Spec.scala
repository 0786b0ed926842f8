package graft

import graft.dedup.SemDedup
import graft.graph.PageRank
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Round-7 gates: SemDeDup two-level coarse quantizer and PageRank
  * convergence mode / checkpointed-iteration plan shape.
  */
class Round7Spec extends SparkSpec {

  import spark.implicits._

  // ---- SemDedup two-level coarse quantizer --------------------------------

  /** The Round6Spec embedding fixture: three well-separated direction
    * groups in 8-dim space, groups 0/1 carry planted near-duplicates.
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

  private def disposition(probe: Int, k: Int, iters: Int, parts: Int = 1) =
    SemDedup.dedup(semCorpus.repartition(parts), k = k, iters = iters,
        eps = 0.95, probe = probe)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq

  test("SemDedup: full-probe two-level assignment ≡ flat, byte-identical") {
    // k=4 → ⌈√k⌉=2 super-cells; probe=2 covers them all, so the probed
    // candidate set is every centroid and the argmax must match the flat
    // pass bit-for-bit — cells, kept flags, everything
    assert(disposition(probe = 2, k = 4, iters = 2) ==
      disposition(probe = 0, k = 4, iters = 2))
  }

  test("SemDedup: probed drop policy recovers planted groups with fixed centroids") {
    // one axis centroid per direction group (the Round6Spec recovery
    // setup), routed through the two-level assignment: every planted
    // group co-locates and only its smallest id survives
    def axis(cid: Long, a: Int) = {
      val v = Array.fill(8)(0f); v(a) = 1f; (cid, v)
    }
    val cents = Seq(axis(0L, 0), axis(1L, 1), axis(2L, 2), axis(3L, 3))
      .toDF("cid", "c_vec")
    val kept = SemDedup.dedupWith(semCorpus, cents, eps = 0.95, probe = 2)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(kept(1L) && !kept(2L) && !kept(3L))
    assert(kept(10L) && !kept(11L))
    assert(kept(20L) && kept(21L) && kept(22L))
  }

  test("SemDedup: partial probe agrees with flat when the true cell survives the probe") {
    // k=n: every vector's own centroid wins at cos=1, and the vector
    // ranks super-cells with the same expression (and tie-break) its
    // centroid was mapped with — so probe=1 still finds the global
    // argmax and the whole disposition matches the flat pass
    val probed = disposition(probe = 1, k = 8, iters = 1)
    assert(probed == disposition(probe = 0, k = 8, iters = 1))
    // completeness: every vector got exactly one cell (k=n means every
    // cluster is a singleton, so the drop policy rightly fires nowhere)
    assert(probed.map(_._1) == Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L))
    assert(probed.forall(_._3))
  }

  test("SemDedup: probed disposition is byte-identical across partitionings") {
    assert(disposition(probe = 1, k = 8, iters = 2, parts = 2) ==
      disposition(probe = 1, k = 8, iters = 2, parts = 7))
    assert(disposition(probe = 2, k = 4, iters = 2, parts = 3) ==
      disposition(probe = 2, k = 4, iters = 2, parts = 5))
  }

  // ---- SemDedup maxCell occupancy guard (r12 `weak`) -----------------------

  /** 12 near-identical vectors that all land in ONE cell under a single
    * axis centroid — the fixed-codebook-over-a-grown-corpus shape the
    * guard exists for.
    */
  private def hotCell = (1L to 12L).map { i =>
    val v = Array.fill(8)(0f); v(0) = 1f; v(4) = 0.0001f * i; (i, v)
  }.toDF("vec_id", "embedding")

  private def oneAxisCent =
    Seq((0L, { val v = Array.fill(8)(0f); v(0) = 1f; v }))
      .toDF("cid", "c_vec")

  private def keptSet(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.where(col("is_kept")).select(col("vec_id")).as[Long].collect().toSet

  test("SemDedup: maxCell at/above the cell size is the exact path, byte-identical") {
    def rows(maxCell: Int) =
      SemDedup.dedupWith(hotCell, oneAxisCent, eps = 0.95, maxCell = maxCell)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // default (4096) and a just-fits cap (12) both compare every pair:
    // only the globally smallest id survives, and the dispositions match
    // bit-for-bit
    assert(rows(4096) == rows(12))
    assert(keptSet(SemDedup.dedupWith(hotCell, oneAxisCent, eps = 0.95)) ==
      Set(1L))
  }

  test("SemDedup: maxCell sub-split bounds the pair stage — drops only shrink, never invent") {
    val exact = keptSet(SemDedup.dedupWith(hotCell, oneAxisCent, eps = 0.95))
    val guarded = keptSet(SemDedup.dedupWith(hotCell, oneAxisCent,
      eps = 0.95, maxCell = 4))
    // sub-splitting removes comparisons, so the guarded kept set can only
    // GROW relative to exact (no invented drops) …
    assert(exact.subsetOf(guarded))
    // … each non-empty sub-cell keeps exactly its smallest id, so at most
    // ⌈12/4⌉ = 3 survivors of a cell of all-duplicates …
    assert(guarded.size <= 3, s"guarded kept $guarded")
    // … and the globally smallest id is the smallest of its sub-cell too
    assert(guarded.contains(1L))
  }

  test("SemDedup: guarded disposition is deterministic across partitionings") {
    def run(parts: Int) =
      SemDedup.dedupWith(hotCell.repartition(parts), oneAxisCent,
          eps = 0.95, maxCell = 4)
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(run(2) == run(7))
  }

  test("SemDedup: caller column order is irrelevant; empty codebook fails loudly") {
    // (c_vec, cid) order must read the same codebook as (cid, c_vec)
    val swapped = oneAxisCent.select(col("c_vec"), col("cid"))
    assert(keptSet(SemDedup.dedupWith(hotCell, swapped, eps = 0.95)) ==
      keptSet(SemDedup.dedupWith(hotCell, oneAxisCent, eps = 0.95)))
    // empty centroid frames fail at plan build, not as silent NULL cells
    val empty = oneAxisCent.where(col("cid") < 0)
    intercept[IllegalArgumentException] {
      SemDedup.dedupWith(hotCell, empty, eps = 0.95)
    }
    intercept[IllegalArgumentException] {
      SemDedup.dedupWith(hotCell, empty, eps = 0.95, probe = 1)
    }
  }

  // ---- MediaHeader: GIF / BMP kernels -------------------------------------

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("MediaHeader: GIF dims parse little-endian; corrupt/truncated reject") {
    import graft.multimodal.MediaHeader
    val gif87 = hx("474946383761" + "4001" + "C800" + "F70000") // 320×200
    assert(MediaHeader.format(gif87).toString == "gif")
    assert(MediaHeader.width(gif87) == 320 && MediaHeader.height(gif87) == 200)
    val gif89 = hx("474946383961" + "0100" + "0100" + "F70000") // 1×1
    assert(MediaHeader.width(gif89) == 1 && MediaHeader.height(gif89) == 1)
    // bad version byte ('8' where '7'/'9' required)
    assert(MediaHeader.format(hx("474946383861" + "01000100F70000")) == null)
    // signature but truncated before the Logical Screen Descriptor
    assert(MediaHeader.format(hx("474946383961" + "0100")) == null)
    // zero width is invalid
    assert(MediaHeader.width(hx("474946383961" + "0000" + "0100" + "F70000")) == -1)
  }

  test("MediaHeader: BMP info/core headers, top-down height, corrupt reject") {
    import graft.multimodal.MediaHeader
    val hdr = "424D" + "00000000" + "00000000" + "36000000"
    val info = hx(hdr + "28000000" + "03000000" + "02000000" + "0100" + "1800")
    assert(MediaHeader.format(info).toString == "bmp")
    assert(MediaHeader.width(info) == 3 && MediaHeader.height(info) == 2)
    // negative (top-down) height: magnitude is the pixel height
    val topDown = hx(hdr + "28000000" + "03000000" + "FEFFFFFF" + "0100" + "1800")
    assert(MediaHeader.height(topDown) == 2 && MediaHeader.width(topDown) == 3)
    // BITMAPCOREHEADER: u16-LE dims at 18/20
    val core = hx(hdr + "0C000000" + "0500" + "0400" + "0100" + "1800")
    assert(MediaHeader.format(core).toString == "bmp")
    assert(MediaHeader.width(core) == 5 && MediaHeader.height(core) == 4)
    // truncated before the dims
    assert(MediaHeader.format(hx(hdr + "28000000" + "030000")) == null)
    // DIB size 20 is neither core (12) nor info family (>= 40)
    assert(MediaHeader.format(
      hx(hdr + "14000000" + "03000000" + "02000000")) == null)
    // zero width is invalid
    assert(MediaHeader.width(
      hx(hdr + "28000000" + "00000000" + "02000000" + "0100" + "1800")) == -1)
  }

  // ---- Bpe: tokenizer-as-artifact round trip ------------------------------

  test("Bpe: loaded merge table encodes bit-identically to the trained one") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the bat and the cat chat"),
      (3L, "that cat that bat that mat"), (4L, "flat rat splat")
    ).toDF("doc_id", "text")
    val trained = graft.functions.Bpe.train(docs, "doc_id", "text",
      nMerges = 12, sampleBasisPoints = 10000)
    assert(trained.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("bpe-art").toString
    graft.functions.Bpe.save(spark, trained, dir)
    val loaded = graft.functions.Bpe.load(spark, dir)
    // the artifact preserves the merge rules AND their priority order
    assert(loaded == trained)
    // and the codegen'd encoder produces identical counts either way
    val viaTrained = docs.select(col("doc_id"),
        graft.functions.Bpe.tokenCount(col("text"), trained).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val viaLoaded = docs.select(col("doc_id"),
        graft.functions.Bpe.tokenCount(col("text"), loaded).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaTrained == viaLoaded)
  }

  // ---- PageRank: checkpointed iteration + convergence mode ----------------

  /** 5-node graph with a dangling node (5 has no out-edges). */
  private def edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L), (4L, 5L), (3L, 5L)
  ).toDF("src", "dst")

  test("PageRank: an iteration's plan reads only the checkpointed frames") {
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("out")), "src")
      .localCheckpoint(true)
    val r = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    val leaves = PageRank.iterate(nodes, eo, r, 850)
      .queryExecution.optimizedPlan.collectLeaves()
    // every leaf is a checkpointed RDD scan — no scan of the raw edge
    // source, no re-run of the node-distinct shuffle inside the loop
    assert(leaves.nonEmpty && leaves.forall(_.isInstanceOf[LogicalRDD]))
  }

  test("PageRank: tolMicro=0 early-stop is a fixed point, bit-identical to a deeper run") {
    val (conv, itersRun) = PageRank.ranksConverged(edges, "src", "dst",
      iters = 40, tolMicro = 0L)
    assert(itersRun < 40, s"expected early convergence, ran $itersRun")
    val deep = PageRank.ranks(edges, "src", "dst", iters = 40)
    assert(conv.as[(Long, Long)].collect().sortBy(_._1).toSeq ==
      deep.as[(Long, Long)].collect().sortBy(_._1).toSeq)
  }

  test("PageRank: dangling redistribution matches hand computation incl. remainder to lowest ids") {
    // 1→2, 1→3, 2→3; node 3 dangling; n = 3. Iter 1 from r0 = 1e6 each:
    // D = (1000000·850) div 1000 = 850000 → each +283333, remainder 1
    // to node 1. c(2) = 850000 div 2 = 425000; c(3) = 425000 + 850000.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = PageRank.ranks(g, "src", "dst", iters = 1,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 433334L, 2L -> 858333L, 3L -> 1708333L), got)
  }

  test("PageRank: redistribution is a no-op on graphs without dangling nodes") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    def run(flag: Boolean) = PageRank.ranks(cycle, "src", "dst", iters = 3,
      redistributeDangling = flag).as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(false) == run(true))
  }

  test("PageRank: redistribution conserves total mass up to per-edge truncation") {
    // With redistribution the only mass leaks are the documented integer
    // floors (< 1 micro-unit per in-edge + per-node share); on the 5-node
    // dangling fixture, total mass must stay within that bound of n·1e6.
    val total = PageRank.ranks(edges, "src", "dst", iters = 10,
        redistributeDangling = true)
      .agg(sum("rank_micro")).as[Long].head()
    // steady-state truncation offset ≈ (per-iter floors)/(1−damp) — a few
    // hundred micro-units here; 1000 is a loose but discriminating bound
    // (the absorbing mode drifts by ~10^5 on this graph)
    assert(math.abs(total - 5L * 1000000L) <= 1000L,
      s"total=$total drifted from ${5L * 1000000L}")
    // the default (absorbing) mode loses mass monotonically — sanity
    val absorbed = PageRank.ranks(edges, "src", "dst", iters = 10)
      .agg(sum("rank_micro")).as[Long].head()
    assert(absorbed < total)
  }

  test("PageRank: q86 cadence unchanged — fixed-iters result matches hand computation") {
    // 2 nodes, 1→2 only: after iter1, rank(1)=150000 (teleport only),
    // rank(2)=150000+850000=1000000·0.85+150000? — verify exactly:
    // iter1: contributions use rank=1000000: c(1→2)=(1000000·850) div
    // (1000·1)=850000; rank(2)=150000+850000=1000000; rank(1)=150000.
    // iter2: c(1→2)=(150000·850) div 1000=127500; rank(2)=277500.
    val tiny = Seq((1L, 2L)).toDF("src", "dst")
    val got = PageRank.ranks(tiny, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 150000L && got(2L) == 277500L)
  }

  // ---- within-doc repetition (q92) ----------------------------------------

  test("Repetition: planted looping doc scores high, unique doc scores zero") {
    import graft.functions.Repetition
    // doc 1: "a b c" ×3 → 7 3-grams ("a b c a b c a b c" has 7 windows),
    //   the gram "a b c" occurs 3×, "b c a" 2×, "c a b" 2× — all 7
    //   occurrences are repeats; top gram occ 3.
    // doc 2: nine distinct tokens → 7 distinct 3-grams, zero repeats.
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val m = Repetition.metrics(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 7L, 7L, 100L, 3L, 42L)))
    assert(m(2L) == ((2L, 7L, 0L, 0L, 1L, 14L)))
  }

  // ---- compression-ratio signal (q94) -------------------------------------

  test("compression ratio brackets looping text below prose below noise") {
    import graft.functions.F
    val loop = ("spam and ham " * 40).trim                 // templated loop
    val prose = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew acidic potions under a waxing moon tonight " +
      "and every villager watches the harvest fires burn out slowly"
    // deterministic noise over the full printable range (~6.6 bits per
    // char — hex digits alone would Huffman-pack BELOW prose entropy)
    val noise = (1 to 40).flatMap { i =>
      val h = graft.functions.Hashing.murmur64(i.toLong)
      (0 until 8).map(b => (33 + (((h >>> (8 * b)) & 0xffL) % 94)).toChar)
    }.mkString
    val docs = Seq((1L, loop), (2L, prose), (3L, noise))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        (F.deflatedLen(col("text")) * 10000 /
          greatest(length(col("text")), lit(1))).cast("int").as("bp"))
    val bp = docs.as[(Long, Int)].collect().toMap
    assert(bp(1L) < bp(2L) && bp(2L) < bp(3L),
      s"expected loop < prose < noise, got $bp")
    // pure function: re-evaluation and partitioning never change it
    val again = Seq((1L, loop)).toDF("doc_id", "text").repartition(7)
      .select(F.deflatedLen(col("text"))).as[Int].head()
    val first = Seq((1L, loop)).toDF("doc_id", "text")
      .select(F.deflatedLen(col("text"))).as[Int].head()
    assert(again == first)
    // null propagates, it never throws
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(F.deflatedLen(col("text"))).collect()
    assert(n.head.isNullAt(0))
  }

  // ---- duplicated spans (q93) ---------------------------------------------

  test("DupSpans: one verbatim block vs scattered dup grams — run length tells them apart") {
    import graft.dedup.DupSpans
    // docs 1/2 share a verbatim 12-token block (positions differ), so
    // both carry a run of 12−5+1 = 8 consecutive duplicated 5-grams →
    // span 8+4 = 12. doc 3 repeats ONE shared 5-gram of doc 4 but in
    // scattered positions → its longest run is 1 → span 5. doc 5 shares
    // nothing → span 0.
    val block = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $block u3"),
      (2L, s"w1 $block w2 w3"),
      (3L, "g1 g2 g3 g4 g5 x1 x2 x3 x4 g1 g2 g3 g4 g5"),
      (4L, "y1 g1 g2 g3 g4 g5 y2 y3 y4 y5 y6 y7 y8 y9"),
      (5L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val m = DupSpans.maxDupSpan(docs, "doc_id", "text", k = 5,
        minSpanTokens = 10L)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(m(1L) == ((1L, 12L, true)))
    assert(m(2L) == ((2L, 12L, true)))
    assert(m(3L)._2 >= 5L && !m(3L)._3) // scattered: short spans only
    assert(m(4L)._2 == 5L && !m(4L)._3)
    assert(m(5L) == ((5L, 0L, false)))
  }

  test("DupSpans: same-document repeats count as duplication (the paper's rule)") {
    import graft.dedup.DupSpans
    // ONE doc that repeats its own 10-token block back-to-back: every
    // 5-gram of the block occurs ≥ 2 times IN THE SAME doc, and the
    // repeated region is one long consecutive dup run.
    val block = (1 to 10).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, s"$block $block")).toDF("doc_id", "text")
    val m = DupSpans.maxDupSpan(docs, "doc_id", "text", k = 5,
        minSpanTokens = 50L)
      .as[(Long, Long, Boolean)].collect()
    // 20 tokens → 16 5-grams; the 6 grams inside each copy match their
    // twin in the other copy (p1..p6 ≡ p11..p16), while the 4 boundary-
    // straddling grams occur once — so two dup runs of 6 → span
    // 6 + 4 = 10; below the 50-token drop bar.
    assert(m.head == ((1L, 10L, false)))
  }
}
