package graft

import graft.functions.{Unigram, UnigramKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM laws the q172/q173 oracles can't isolate: the DP against
  * hand-computed optima, the longest-piece tie-break, the uncoverable
  * sentinel, the EM count step on a hand-weighted fixture, and the
  * full Viterbi-EM trainer's invariants (char coverage, vocab cap,
  * pruning, cross-partitioning determinism).
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(w: String, tab: Seq[(String, Long)]): String = {
    val r = UnigramKernels.segment(UTF8String.fromString(w),
      UTF8String.fromString(Unigram.toSpec(tab)))
    if (r == null) null else r.toString
  }
  private def sc(w: String, tab: Seq[(String, Long)]): java.lang.Long =
    UnigramKernels.scoreMilli(UTF8String.fromString(w),
      UTF8String.fromString(Unigram.toSpec(tab)))

  test("viterbi picks the max-score segmentation, not greedy longest-match") {
    // "abc": a|bc = -1000-1500 = -2500; ab|c = -1800-1200 = -3000;
    // abc = -2600; a|b|c = -1000-1100-1200 = -3300 → "abc" loses to a|bc
    val tab = Seq("a" -> -1000L, "b" -> -1100L, "c" -> -1200L,
      "ab" -> -1800L, "bc" -> -1500L, "abc" -> -2600L)
    assert(seg("abc", tab) === "a|bc")
    assert(sc("abc", tab) === -2500L)
    // flip: make the trigram worth it
    val tab2 = tab.map { case ("abc", _) => "abc" -> -2400L; case x => x }
    assert(seg("abc", tab2) === "abc")
    assert(sc("abc", tab2) === -2400L)
  }

  test("ties prefer the LONGEST final piece (strictly-greater descending scan)") {
    // x|y = -2000 ties xy = -2000 → xy wins
    val tab = Seq("x" -> -1000L, "y" -> -1000L, "xy" -> -2000L)
    assert(seg("xy", tab) === "xy")
    assert(sc("xy", tab) === -2000L)
  }

  test("uncoverable word returns the null sentinel, never a throw") {
    val tab = Seq("a" -> -1000L)
    assert(seg("ab", tab) === null)
    assert(sc("ab", tab) === null)
  }

  test("kernel matches a brute-force enumeration on every short word") {
    val tab = Seq("a" -> -3501L, "b" -> -3502L, "c" -> -3503L,
      "ab" -> -5201L, "ba" -> -5202L, "bc" -> -5203L, "ca" -> -5204L,
      "abc" -> -6601L, "bca" -> -6602L, "abca" -> -8001L)
    val m = tab.toMap
    def brute(w: String): Long = {
      def go(i: Int): Long =
        if (i == w.length) 0L
        else (1 to math.min(Unigram.MaxPieceLen, w.length - i)).flatMap {
          l => m.get(w.substring(i, i + l)).map(_ + go(i + l))
        }.max
      go(0)
    }
    val alphabet = "abc"
    val words = for {
      n <- 1 to 5
      k <- 0 until math.pow(3, n).toInt
    } yield (0 until n).map(d =>
      alphabet((k / math.pow(3, d).toInt) % 3)).mkString
    words.foreach { w =>
      assert(sc(w, tab) === brute(w), s"word $w")
      // the reported segmentation re-scores to the reported total
      val pieces = seg(w, tab).split("\\|")
      assert(pieces.mkString === w, s"word $w concatenation")
      assert(pieces.map(m).sum === sc(w, tab).longValue, s"word $w score")
    }
  }

  test("emStep counts pieces frequency-weighted with exact floor shares") {
    val tab = Seq("a" -> -1000L, "b" -> -1100L, "ab" -> -1900L)
    // "ab" → ab (one piece); "aab" → a|ab; weights 3 and 2
    val words = Seq(("ab", 3L), ("aab", 2L)).toDF("word", "f")
    val got = Unigram.emStep(words, tab)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // pieces: ab ×(3+2)=5, a ×2; total 7
    assert(got === Seq(("a", 2L, 285714L), ("ab", 5L, 714285L)))
  }

  test("trainer: char coverage kept, vocab capped, unused pieces pruned, deterministic") {
    val docs = (0 until 64).map { i =>
      val w = Seq("scan", "merge", "batch", "window")(i % 4)
      (i.toLong, s"$w the $w data")
    }.toDF("doc_id", "text")
    val t1 = Unigram.train(docs, "text", vocabSize = 40, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val t2 = Unigram.train(docs.repartition(7), "text",
      vocabSize = 40, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(t1 === t2) // partitioning-independent
    val pieces = t1.map(_._1)
    // every character of the corpus survives (coverage invariant)
    val chars = "scanmergebatchwindowthedata".distinct.map(_.toString)
    chars.foreach(c => assert(pieces.contains(c), s"char $c"))
    assert(pieces.length <= 40)
    // multi-char pieces all carry positive final counts (pruned else)
    t1.filter(_._1.length > 1).foreach { case (p, _, c) =>
      assert(c > 0L, s"piece $p kept with zero count")
    }
  }

  test("type-level encode distributes: distinct-word frame, no per-token kernel") {
    // the q172 shape — segment once per TYPE then join back; pin that
    // the segmented frame's row count equals the type count
    val docs = (0 until 128).map(i =>
      (i.toLong, "scan merge scan merge batch")).toDF("doc_id", "text")
    val types = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .where(col("word").rlike("^[a-z]{1,16}$")).distinct()
    val tab = ('a' to 'z').map(c => c.toString -> (-3500L - (c - 'a'))) ++
      Seq("sc" -> -5200L, "an" -> -5210L, "me" -> -5220L, "rge" -> -6600L)
    val got = types.select(col("word"),
      Unigram.segment(col("word"), tab).as("seg")).collect()
    assert(got.length === 3)
    val m = got.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("scan") === "sc|an")
    assert(m("merge") === "me|rge")
  }
}
