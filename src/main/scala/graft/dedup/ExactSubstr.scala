package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  - **Rank tables.** `ranks(k)[doc, off]` = the dense rank of the
  *    character window `text[off, off+2^k)` among ALL corpus windows,
  *    built by k rounds of prefix-doubling: pair each position's rank
  *    with the rank 2^(k−1) ahead (−1 past the end — a sentinel no
  *    real rank equals, so padded windows never conflate with real
  *    ones), then densely re-rank the distinct pairs through the
  *    Prefix distributed rank (range-partition + broadcast offsets —
  *    no SinglePartition anywhere). Two windows are equal iff their
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
  * checkpointed so lineage stays flat. Corpus text re-enters only
  * when a caller asks for the duplicated SUBSTRINGS themselves
  * (bounded: one `substring` per reported span). Duplicate counting
  * is corpus-global (a second occurrence inside the same document
  * counts, like the paper). The window cap (default 64 = 6 rounds)
  * is the Lee et al. operating point (their threshold is 50 BPE
  * tokens; spans LONGER than the probe merge into maximal intervals,
  * so no duplicated region is ever missed — only reported as the
  * union of its covered positions).
  */
object ExactSubstr {

  /** (doc_id, off 1-based, r = char code) + (doc_id, len) frames. */
  private[dedup] def charPositions(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    val base = docs.where(col(textCol).isNotNull)
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

  /** The rank tables: element k ranks windows of length 2^k.
    * `rounds` = 6 distinguishes windows up to 64 chars.
    */
  private[dedup] def rankTables(pos0: DataFrame, rounds: Int)
      : IndexedSeq[DataFrame] = {
    var cur = pos0.localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer(cur)
    var half = 1L
    var k = 0
    while (k < rounds) {
      val shifted = cur.select(col("doc_id"),
        (col("off") - half).as("off"), col("r").as("r2"))
      val paired = cur.join(shifted, Seq("doc_id", "off"), "left")
        .select(col("doc_id"), col("off"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      val keys = paired.select(col("r"), col("r2")).distinct()
      val ranked = graft.etl.Prefix
        .withRankAndPrefix(keys, Seq("r", "r2"), Nil)
        .withColumnRenamed("idx", "nr")
      cur = paired.join(ranked, Seq("r", "r2"))
        .select(col("doc_id"), col("off"), col("nr").as("r"))
        .localCheckpoint(true) // flat lineage: log-deep otherwise
      out += cur
      half *= 2
      k += 1
    }
    out.toIndexedSeq
  }

  /** Starts of length-`win` windows that occur ≥ 2 times corpus-wide —
    * exact, via the sparse-table pair over `ranks`. Output
    * (doc_id, off, ra, rb): (ra, rb) identifies the window CONTENT
    * (two windows are equal iff their key pairs are).
    */
  private[dedup] def dupWindowStarts(ranks: IndexedSeq[DataFrame],
      lens: DataFrame, win: Long): DataFrame = {
    require(win >= 1, s"window must be >= 1, got $win")
    val j = 63 - java.lang.Long.numberOfLeadingZeros(win) // floor log2
    require(j < ranks.length,
      s"window $win needs rank table $j; built ${ranks.length - 1}")
    val rj = ranks(j.toInt)
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
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Long = 12L): DataFrame = {
    val (pos, lens) = charPositions(docs, idCol, textCol)
    val j = 63 - java.lang.Long.numberOfLeadingZeros(minLen)
    val ranks = rankTables(pos, j.toInt)
    mergeSpans(dupWindowStarts(ranks, lens, minLen), minLen)
  }

  /** Gaps-and-islands union of the fixed-length windows at `starts`. */
  private[dedup] def mergeSpans(starts: DataFrame, win: Long)
      : DataFrame = {
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
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String,
      probes: Seq[Long] = Seq(8L, 16L, 32L, 64L)): DataFrame = {
    require(probes.nonEmpty &&
      probes.forall(p => p >= 1 && (p & (p - 1)) == 0L),
      s"probes must be powers of two, got $probes")
    val (pos, lens) = charPositions(docs, idCol, textCol)
    val maxJ = probes.map(p => 63 - java.lang.Long.numberOfLeadingZeros(p)).max
    val ranks = rankTables(pos, maxJ.toInt)
    val total = lens.agg(sum(col("len")).as("total_chars"))
    probes.map { p =>
      val starts = dupWindowStarts(ranks, lens, p)
        .localCheckpoint(true) // three consumers: counts + island union
      val covered = mergeSpans(starts, p)
        .agg(coalesce(sum(col("span_len")), lit(0L)).as("covered_chars"))
      starts.agg(count(lit(1)).as("n_dup_starts"),
          countDistinct(col("ra"), col("rb")).as("n_dup_substrings"))
        .crossJoin(broadcast(covered))
        .crossJoin(broadcast(total))
        .select(lit(p).as("probe_len"), col("n_dup_starts"),
          col("n_dup_substrings"), col("covered_chars"),
          col("total_chars"),
          expr("(1000000 * covered_chars) div total_chars")
            .as("covered_x1e6"))
    }.reduce(_ unionByName _)
  }
}
