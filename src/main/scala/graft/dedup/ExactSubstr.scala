package graft.dedup

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** EXACT substring-duplication analysis by distributed prefix-doubling
  * — the suffix-array rank construction (Manber & Myers 1990; the
  * distributed formulation of Flick & Aluru 2015) over the
  * [[graft.etl.Prefix]] rank machinery, closing the last documented
  * dedup deviation (VERDICT r17 next-task 6): [[DupSpans]] (q93)
  * approximates Lee et al. 2022's ExactSubstr with HASHED token
  * k-grams — token granularity hides character-level duplicates that
  * straddle token boundaries, and hashing admits collisions.
  * This module is exact at character level:
  *
  *  - **Rank tables.** level-k table `[doc, off, r]` = the dense rank
  *    of the character window `text[off, off+2^k)` among ALL corpus
  *    windows, built by k rounds of prefix-doubling: pair each
  *    position's rank with the rank 2^(k−1) ahead (−1 past the end — a
  *    sentinel no real rank equals, so padded windows never conflate
  *    with real ones), then densely re-rank the distinct pairs through
  *    the Prefix distributed rank (range-partition + broadcast offsets
  *    — no SinglePartition anywhere). Two windows are equal iff their
  *    ranks are equal — EXACT, no hashes.
  *  - **Arbitrary window length** L via the sparse-table trick: with
  *    j = ⌊log₂ L⌋, `text[i, i+L) = text[i', i'+L)` iff
  *    `ranks(j)[i] = ranks(j)[i']` and
  *    `ranks(j)[i+L−2^j] = ranks(j)[i'+L−2^j]` — O(1) per position
  *    off two rank lookups, no further rounds.
  *
  * Scale shape: after the one-time char-code explode, every frame is
  * (doc_id BIGINT, off BIGINT, r BIGINT) — 24-byte rows, never text.
  * ⌈log₂ L⌉ rounds, each two narrow hash shuffles (the self-join at
  * offset 2^k and the distinct-pair rank), each round's output
  * checkpointed so lineage stays flat.
  *
  * **Materialization policy (the r18 10× lesson — VERDICT r18 #1/#3):
  * corpus-characters-sized frames persist DISK_ONLY, and every frame
  * is RELEASED the moment its last consumer has materialized.** The
  * r18 build eagerly `localCheckpoint`ed every rank round at the
  * default deserialized MEMORY_AND_DISK level and retained all of
  * them (plus two Prefix-internal snapshots per round, plus one
  * per-probe starts frame) for the session's lifetime — ~15 pinned
  * corpus-sized frames, which OOM-killed q176 one decade up. Now at
  * most THREE such frames are ever live at once (the current table,
  * the next table mid-build, and one starts frame), serialized on
  * disk, and the one-time level-⌊log₂ minLen⌋ build is shareable
  * across the q175/q176/q178 family instead of being rebuilt per
  * query.
  *
  * Corpus text re-enters only when a caller asks for the duplicated
  * SUBSTRINGS themselves or for the cleaned corpus ([[removeDupSpans]]
  * — bounded: one `substr` per kept segment). Duplicate counting is
  * corpus-global (a second occurrence inside the same document counts,
  * like the paper). The window cap (default 64 = 6 rounds) is the
  * Lee et al. operating point (their threshold is 50 BPE tokens; spans
  * LONGER than the probe merge into maximal intervals, so no
  * duplicated region is ever missed — only reported as the union of
  * its covered positions).
  */
object ExactSubstr {

  /** Big-frame checkpoint: eager (flat lineage) + serialized on disk —
    * these frames are corpus-characters-sized and re-read at most a
    * handful of times; pinning them deserialized in memory is what
    * killed the r18 10× run.
    */
  private def ckptDisk(df: DataFrame): DataFrame =
    df.localCheckpoint(true, StorageLevel.DISK_ONLY)

  /** (doc_id, off 1-based, r = char code) + (doc_id, len) frames. */
  private[dedup] def charPositions(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    // the length >= 1 guard (ADVICE r18): Spark's sequence(1, 0)
    // defaults to step -1 and yields [1, 0] — an EMPTY text would
    // inject two phantom positions into every rank round, kept out of
    // the output only by the downstream full-window filter
    val base = docs
      .where(col(textCol).isNotNull && length(col(textCol)) >= 1)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val pos = base
      .select(col("doc_id"), posexplode(
        expr(s"transform(sequence(1, length(text)), " +
          "i -> cast(ascii(substring(text, i, 1)) as bigint))"))
        .as(Seq("p0", "r")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("off"),
        col("r"))
    val lens = base.select(col("doc_id"),
      length(col("text")).cast("long").as("len"))
    (pos, lens)
  }

  /** One prefix-doubling round: the level-(k−1) table (windows of
    * length `half`) → the level-k table (windows of length 2·half),
    * eagerly checkpointed DISK_ONLY. Releases the Prefix-internal
    * range-partitioned snapshot once the new table is materialized;
    * the INPUT table is the caller's to release.
    */
  private def nextRank(cur: DataFrame, half: Long): DataFrame = {
    val shifted = cur.select(col("doc_id"),
      (col("off") - half).as("off"), col("r").as("r2"))
    val paired = cur.join(shifted, Seq("doc_id", "off"), "left")
      .select(col("doc_id"), col("off"), col("r"),
        coalesce(col("r2"), lit(-1L)).as("r2"))
    val keys = paired.select(col("r"), col("r2")).distinct()
    val ranked = graft.etl.Prefix
      .withRankAndPrefix(keys, Seq("r", "r2"), Nil)
      .withColumnRenamed("idx", "nr")
    val out = ckptDisk(paired.join(ranked, Seq("r", "r2"))
      .select(col("doc_id"), col("off"), col("nr").as("r")))
    // out is materialized; ranked's only storage is Prefix's internal
    // range-partitioned checkpoint — release it (its own input snapshot
    // is released inside Prefix)
    GraftSqlBridge.unpersistCheckpoints(ranked)
    out
  }

  /** The level-`level` rank table (windows of length 2^level) plus the
    * per-doc length frame, both persisted (rank table DISK_ONLY); every
    * intermediate level is released as soon as the next is built. The
    * returned pair is the caller's to release — or to MEMOIZE: the
    * q175/q176/q178 family shares one level-⌊log₂ minLen⌋ build
    * (VERDICT r18 task 4) instead of each query re-running the
    * ⌈log₂ L⌉ shuffle rounds.
    */
  def rankAndLens(docs: DataFrame, idCol: String, textCol: String,
      level: Int): (DataFrame, DataFrame) = {
    require(level >= 0, s"level must be >= 0, got $level")
    val (pos, lens0) = charPositions(docs, idCol, textCol)
    val lens = lens0.localCheckpoint(true) // one row per doc — small
    var cur = ckptDisk(pos)
    var half = 1L
    var k = 1
    while (k <= level) {
      val nxt = nextRank(cur, half)
      GraftSqlBridge.unpersistCheckpoints(cur) // level k-1: done with it
      cur = nxt
      half *= 2
      k += 1
    }
    (cur, lens)
  }

  /** Starts of length-`win` windows that occur ≥ 2 times corpus-wide —
    * exact, via the sparse-table pair over the level-`j` table `rj`
    * (requires 2^j ≤ win < 2^(j+1)). Output (doc_id, off, ra, rb):
    * (ra, rb) identifies the window CONTENT (two windows are equal iff
    * their key pairs are).
    */
  def dupWindowStartsFrom(rj: DataFrame, j: Int, lens: DataFrame,
      win: Long): DataFrame = {
    require(win >= 1, s"window must be >= 1, got $win")
    require(j == 63 - java.lang.Long.numberOfLeadingZeros(win),
      s"window $win needs the level-${63 - java.lang.Long
        .numberOfLeadingZeros(win)} table, got level $j")
    val shift = win - (1L << j)
    val keyed =
      if (shift == 0L) rj.select(col("doc_id"), col("off"),
        col("r").as("ra"), lit(0L).as("rb"))
      else rj.join(
        rj.select(col("doc_id"), (col("off") - shift).as("off"),
          col("r").as("rb")),
        Seq("doc_id", "off"))
        .select(col("doc_id"), col("off"), col("r").as("ra"), col("rb"))
    val full = keyed.join(lens, Seq("doc_id"))
      .where(col("off") <= col("len") - win + 1)
      .select(col("doc_id"), col("off"), col("ra"), col("rb"))
    val occ = full.groupBy(col("ra"), col("rb"))
      .agg(count(lit(1)).as("occ"))
    full.join(occ.where(col("occ") >= 2), Seq("ra", "rb"))
      .select(col("doc_id"), col("off"), col("ra"), col("rb"))
  }

  /** Exact maximal duplicated spans of length ≥ `minLen` per document:
    * every position lying inside SOME corpus-duplicated substring of
    * length ≥ minLen is covered, with exact boundaries (a duplicated
    * substring of length ≥ L is duplicated in every one of its
    * L-windows, and every duplicated L-window is itself a duplicated
    * substring — so the union of duplicated L-window extents IS the
    * exact covered set). Output: (doc_id, span_start 1-based,
    * span_end exclusive, span_len).
    *
    * Standalone build; SparkEntry's q175 routes through the shared
    * memoized (rank, lens, starts) substrate instead via
    * [[dupSpansFromStarts]].
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long = 12L): DataFrame = {
    val j = 63 - java.lang.Long.numberOfLeadingZeros(minLen)
    val (rj, lens) = rankAndLens(docs, idCol, textCol, j.toInt)
    dupSpansFromStarts(dupWindowStartsFrom(rj, j.toInt, lens, minLen),
      minLen)
  }

  /** Gaps-and-islands union of the fixed-length windows at `starts`
    * ((doc_id, off, …) — extra columns ignored). */
  def dupSpansFromStarts(starts: DataFrame, win: Long): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("off"))
    starts
      .withColumn("newi",
        when(col("off") > coalesce(lag(col("off"), 1).over(w),
          lit(Long.MinValue / 2)) + win, 1L).otherwise(0L))
      .withColumn("isl", sum(col("newi")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("off")).as("span_start"),
        (max(col("off")) + win).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
  }

  /** Corpus repetition profile at power-of-two probe lengths (the
    * Lee et al. "how much of the corpus is duplicated text" table):
    * per probe, the count of duplicated window starts, the count of
    * DISTINCT duplicated substrings, the characters covered by the
    * union of duplicated windows, and the covered share ×10⁶.
    *
    * EAGER: the per-probe numbers are single-row aggregates, so they
    * collect during the build — each probe's starts frame and each
    * intermediate rank level is released the moment its numbers are
    * in hand, and the result ships as a literal frame. (The r18 lazy
    * variant kept every level and every starts frame pinned until
    * action time — the 10× OOM.)
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
      probes: Seq[Long] = Seq(8L, 16L, 32L, 64L)): DataFrame = {
    require(probes.nonEmpty &&
      probes.forall(p => p >= 1 && (p & (p - 1)) == 0L),
      s"probes must be powers of two, got $probes")
    val minLevel =
      (63 - java.lang.Long.numberOfLeadingZeros(probes.min)).toInt
    val (base, lens) = rankAndLens(docs, idCol, textCol, minLevel)
    repetitionProfileFrom(docs.sparkSession, base, minLevel, lens,
      probes, releaseBase = true)
  }

  /** [[repetitionProfile]] continuing from an already-built level-
    * `baseLevel` table (the shared q175/q176/q178 substrate). With
    * `releaseBase = false` the base table and lens survive for the
    * next caller; every HIGHER level this call builds is always
    * released before returning.
    */
  def repetitionProfileFrom(spark: SparkSession, base: DataFrame,
      baseLevel: Int, lens: DataFrame, probes: Seq[Long],
      releaseBase: Boolean): DataFrame = {
    require(probes.nonEmpty &&
      probes.forall(p => p >= 1 && (p & (p - 1)) == 0L),
      s"probes must be powers of two, got $probes")
    val levels = probes.map(p =>
      (63 - java.lang.Long.numberOfLeadingZeros(p)).toInt)
    require(levels.min >= baseLevel,
      s"smallest probe needs level ${levels.min} < base $baseLevel")
    val totalChars = lens.agg(coalesce(sum(col("len")), lit(0L)))
      .head().getLong(0)

    // per-probe numbers, all collected eagerly (single rows), starts
    // released immediately after
    def statsAt(level: Int, table: DataFrame): Row = {
      val p = 1L << level
      val starts = ckptDisk(dupWindowStartsFrom(table, level, lens, p))
      val cRow = starts.agg(count(lit(1)).as("n_dup_starts"),
        countDistinct(col("ra"), col("rb")).as("n_dup_substrings"))
        .head()
      val covered = dupSpansFromStarts(starts, p)
        .agg(coalesce(sum(col("span_len")), lit(0L))).head().getLong(0)
      GraftSqlBridge.unpersistCheckpoints(starts)
      val share =
        if (totalChars == 0L) 0L else (1000000L * covered) / totalChars
      Row(p, cRow.getLong(0), cRow.getLong(1), covered, totalChars, share)
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Row)]
    if (levels.contains(baseLevel))
      rows += ((1L << baseLevel, statsAt(baseLevel, base)))
    var cur = base
    var half = 1L << baseLevel
    var k = baseLevel + 1
    while (k <= levels.max) {
      val nxt = nextRank(cur, half)
      if (!(cur eq base)) GraftSqlBridge.unpersistCheckpoints(cur)
      cur = nxt
      half *= 2
      if (levels.contains(k)) rows += ((half, statsAt(k, cur)))
      k += 1
    }
    if (!(cur eq base)) GraftSqlBridge.unpersistCheckpoints(cur)
    if (releaseBase) {
      GraftSqlBridge.unpersistCheckpoints(base)
      GraftSqlBridge.unpersistCheckpoints(lens)
    }
    val ordered = probes.map(p => rows.find(_._1 == p).get._2)
    val schema = StructType(Seq("probe_len", "n_dup_starts",
      "n_dup_substrings", "covered_chars", "total_chars",
      "covered_x1e6").map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(ordered: _*), schema)
  }

  /** The Lee et al. 2022 DEPLOYMENT step (VERDICT r18 task 5): emit
    * the corpus with duplicated spans CUT, keep-FIRST-occurrence. Per
    * duplicated window content, the occurrence with the smallest
    * (doc_id, off) corpus-wide is the keeper; every position covered
    * by a NON-keeper duplicated window is removed, and each document's
    * removed ranges (the gaps-and-islands union — disjoint, sorted)
    * are cut from its text by one pass of kept-segment concatenation.
    * A keeper window overlapping a removed range is partially cut —
    * the contract is positional (remove the union of non-first
    * duplicated window extents), which keeps the semantics exactly
    * SQL-replayable. Output: (doc_id, text_clean, n_cut, chars_cut) —
    * one row per input document (docs with nothing to cut pass
    * through with n_cut = 0).
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long = 12L): DataFrame = {
    val j = 63 - java.lang.Long.numberOfLeadingZeros(minLen)
    val (rj, lens) = rankAndLens(docs, idCol, textCol, j.toInt)
    removeDupSpansFromStarts(docs, idCol, textCol,
      dupWindowStartsFrom(rj, j.toInt, lens, minLen), minLen)
  }

  /** [[removeDupSpans]] from a precomputed duplicated-window starts
    * frame (the shared substrate path). */
  def removeDupSpansFromStarts(docs: DataFrame, idCol: String,
      textCol: String, starts: DataFrame, win: Long): DataFrame = {
    // keeper per content key: the smallest (doc_id, off) — one narrow
    // shuffle on (ra, rb), then drop the keeper row positionally
    val keeper = starts.groupBy(col("ra"), col("rb"))
      .agg(min(struct(col("doc_id"), col("off"))).as("k"))
    val marked = starts.join(keeper, Seq("ra", "rb"))
      .where(!(col("doc_id") === col("k.doc_id") &&
        col("off") === col("k.off")))
      .select(col("doc_id"), col("off"))
    val cuts = dupSpansFromStarts(marked, win)
    val perDoc = cuts.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(
          col("span_start").as("s"), col("span_end").as("e")))).as("sp"),
        count(lit(1)).as("n_cut"),
        sum(col("span_len")).as("chars_cut"))
    // kept-segment concatenation: fold the disjoint sorted cut ranges,
    // appending the segment BEFORE each range, then the tail — one
    // substr per kept segment, inside whole-stage codegen
    val doc = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val rebuilt = aggregate(
      col("sp"),
      struct(lit(1L).as("pos"), lit("").as("acc")),
      (st, x) => struct(
        x.getField("e").as("pos"),
        concat(st.getField("acc"),
          col("text").substr(st.getField("pos").cast("int"),
            (x.getField("s") - st.getField("pos")).cast("int")))
          .as("acc")),
      st => concat(st.getField("acc"),
        col("text").substr(st.getField("pos").cast("int"),
          (length(col("text")).cast("long") + 1L - st.getField("pos"))
            .cast("int"))))
    doc.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("sp").isNull, col("text")).otherwise(rebuilt)
          .as("text_clean"),
        coalesce(col("n_cut"), lit(0L)).as("n_cut"),
        coalesce(col("chars_cut"), lit(0L)).as("chars_cut"))
  }
}
