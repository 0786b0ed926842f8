package graft

import graft.dedup.DupNgramStats
import graft.etl.{BloomSemiJoin, CdcMerge, Chunking, RankTrim}
import graft.functions.{BloomF, TermScores, TextClean}
import org.apache.spark.sql.functions._

/** Round-3 operators: CDC merge, context-window chunking, rank-band trim,
  * inverted index — hand-computable fixtures.
  */
class Round3Spec extends SparkSpec {

  import spark.implicits._

  test("CdcMerge: latest seq wins, deletes drop, inserts land, untouched rows survive") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val chg = Seq(
      (1L, 1L, "U", "a1"), (1L, 2L, "U", "a2"), // two updates → a2 wins
      (2L, 1L, "D", null), // delete
      (4L, 1L, "I", "d") // insert new key
    ).toDF("k", "seq", "op", "v")
    val got = CdcMerge(snap, chg, "k", "seq", "op", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("CdcMerge: a delete followed by a re-insert at a higher seq resurrects the key") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val chg = Seq((1L, 1L, "D", null), (1L, 2L, "I", "a9"))
      .toDF("k", "seq", "op", "v")
    val got = CdcMerge(snap, chg, "k", "seq", "op", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a9"))
  }

  test("Chunking: windows cover every token, overlap by window-stride, last chunk clamps") {
    // 10 tokens, window 4, stride 3 → chunks at 0,3,6 and a clamped 9th-start
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Chunking.tokenWindows(docs, "doc_id", "text", window = 4, stride = 3)
      .select("chunk_id", "start_tok", "n_tok_chunk")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    // every token index is inside at least one chunk
    val covered = got.flatMap { case (_, s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 10L).toSet)
    // exactly-window-sized doc → one chunk
    val one = Chunking.tokenWindows(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 4, 3)
      .count()
    assert(one == 1L)
  }

  test("Chunking: chunk text arithmetic matches a hand slice") {
    val docs = Seq((7L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(docs, "doc_id", "text", 3, 2)
      .select("chunk_id", "n_tok_chunk", "n_chars_chunk")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // chunks: [aa bb cc] (8 chars), [cc dd ee] (8 chars — starts at token 2)
    assert(got.toSeq == Seq((0L, 3L, 8L), (1L, 3L, 8L)))
  }

  test("RankTrim.middleBand equals the naive global-sort rank filter") {
    val df = (1L to 200L).map(i => (i, (i * 37) % 23)).toDF("id", "v")
    val got = RankTrim.middleBand(df, "id", "v", trimBp = 1000)
      .select("id", "grank").as[(Long, Long)].collect().toMap
    // naive: global row_number over (v, id)
    val naive = df.as[(Long, Long)].collect().sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }
    val n = naive.length
    val lo = n * 1000 / 10000
    val expected = naive.filter { case (_, r) => r > lo && r <= n - lo }.toMap
    assert(got == expected)
  }

  test("RankTrim: boundary ties split by id, trimBp=0 keeps everything") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "v")
    val all = RankTrim.middleBand(df, "id", "v", 0).collect()
    assert(all.length == 4)
    // 25% trim of 4 rows → drop rank 1 (id 1) and rank 4 (id 4)
    val mid = RankTrim.middleBand(df, "id", "v", 2500)
      .select("id").as[Long].collect().sorted
    assert(mid.toSeq == Seq(2L, 3L))
  }

  test("invertedIndex: postings are doc-ordered, df counts docs not occurrences, maxDf caps") {
    val docs = Seq(
      (3L, "x y x"), // x tf=2
      (1L, "x z"),
      (2L, "z z z")
    ).toDF("doc_id", "text")
    val idx = TermScores.invertedIndex(docs, "doc_id", "text")
      .select("term", "df", "doc_id", "prank", "tf")
      .as[(String, Long, Long, Long, Long)].collect()
    val x = idx.filter(_._1 == "x").sortBy(_._4)
    assert(x.map(r => (r._3, r._4, r._5)).toSeq == Seq((1L, 1L, 1L), (3L, 2L, 2L)))
    assert(x.forall(_._2 == 2L)) // df of x = 2 docs (not 3 occurrences)
    val y = idx.filter(_._1 == "y")
    assert(y.length == 1 && y.head._2 == 1L)
    // maxDf=1 drops x and z (df 2), keeps y
    val capped = TermScores.invertedIndex(docs, "doc_id", "text", maxDf = 1)
      .select("term").as[String].collect().toSet
    assert(capped == Set("y"))
  }

  test("SnapshotDiff classifies added/removed/changed/same; null payloads compare stably") {
    import graft.etl.SnapshotDiff
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val after = Seq((1L, "a"), (2L, "B2"), (5L, "e"), (4L, null.asInstanceOf[String]))
      .toDF("k", "v")
    val got = SnapshotDiff.diff(before, after, "k", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "same", 2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "same"))
  }

  test("SnapshotDiff multi-column payloads don't collide across column boundaries") {
    import graft.etl.SnapshotDiff
    // ("ab","c") vs ("a","bc") concatenate identically without a separator
    val before = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val after = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = SnapshotDiff.diff(before, after, "k", Seq("x", "y"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "changed", "column-boundary shift must read as a change")
    // null vs the sentinel-looking empty string are distinct too
    val b2 = Seq((1L, null.asInstanceOf[String], "z")).toDF("k", "x", "y")
    val a2 = Seq((1L, "", "z")).toDF("k", "x", "y")
    assert(SnapshotDiff.diff(b2, a2, "k", Seq("x", "y"))
      .as[(Long, String)].collect().toMap.apply(1L) == "changed")
  }

  test("KAnonymity counts rows and groups under the k threshold") {
    import graft.etl.KAnonymity
    // groups: (x: 3 rows), (y: 1 row), (z: 2 rows); k=3 → y and z at risk
    val df = Seq("x", "x", "x", "y", "z", "z").toDF("q")
    val got = KAnonymity.audit(df, Seq("q"), k = 3L)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((3L, 3L, 2L, 1L))) // n_groups, rows_at_risk, groups_at_risk, min_group
  }

  test("timeInState clips open intervals to the horizon and weights by days") {
    import graft.etl.Scd2
    import java.sql.Timestamp
    // key 1: state A [jan1, jan11) then B [jan11, open) — horizon ends feb1
    val chg = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "A"),
      (1L, Timestamp.valueOf("2024-01-11 00:00:00"), "B"))
      .toDF("k", "eff", "st")
    val got = Scd2.timeInState(chg, "k", col("eff"), "st",
      lit("2024-01-01"), lit("2024-02-01"))
      .select("st", "total_days").as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 10L, "B" -> 21L))
    // interval entirely before the horizon contributes zero days
    val early = Scd2.timeInState(chg, "k", col("eff"), "st",
      lit("2025-01-01"), lit("2025-02-01"))
      .select("st", "total_days").as[(String, Long)].collect().toMap
    assert(early("A") == 0L && early("B") == 31L) // open interval clips to horizon
  }

  test("GroupStats.medianBy returns the exact lower-median member per group") {
    import graft.etl.GroupStats
    val df = Seq(
      ("g1", 1.0, 1L), ("g1", 5.0, 2L), ("g1", 9.0, 3L), // odd: median 5.0
      ("g2", 2.0, 4L), ("g2", 4.0, 5L), ("g2", 6.0, 6L), ("g2", 8.0, 7L) // even: lower median 4.0
    ).toDF("g", "v", "id")
    val got = GroupStats.medianBy(df, col("g"), col("v"), col("id"))
      .select("grp", "median_v", "median_id")
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("g1") == ((5.0, 2L)))
    assert(got("g2") == ((4.0, 5L)))
  }

  test("MovingAgg RANGE frame shrinks over series gaps (a ROWS frame would reach back)") {
    import graft.etl.MovingAgg
    val rows = Seq(
      ("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
      ("a", "2024-01-03", 30.0),
      ("a", "2024-01-20", 40.0) // 17-day gap: its 3-day window is ONLY itself
    ).toDF("k", "d", "v")
    val got = MovingAgg.trailingDaily(rows, col("k"),
      col("d").cast("date"), col("v"), days = 3)
      .select("d", "total_w", "n_days_w")
      .as[(java.sql.Date, Double, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3))).toMap
    assert(got("2024-01-03") == ((60.0, 3L)))
    assert(got("2024-01-20") == ((40.0, 1L)), "gap day must not see old rows")
    assert(got("2024-01-01") == ((10.0, 1L)))
  }

  test("redactPii masks URL, IP, phone, email; URL-embedded IPs are not double-masked") {
    val rows = Seq(
      (1L, "see https://x.org/a?b=1 and http://10.0.0.1/path then 10.2.3.4 " +
        "call +48 123-456-789 mail bob@x.example.org end"),
      (2L, "clean text, no pii 1.2.3 (three octets, not an ip)")
    ).toDF("id", "t")
    val got = rows.select(col("id"), TextClean.redactPii(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "see <URL> and <URL> then <IP> call <PHONE> mail <EMAIL> end")
    assert(got(2L) == "clean text, no pii 1.2.3 (three octets, not an ip)")
  }

  test("DupNgramStats: a fully duplicated doc scores 100, a unique doc scores 0") {
    val shared = "p q r s t u v w" // 8 tokens → 4 distinct 5-grams
    val docs = Seq(
      (1L, shared), (2L, shared), // exact near-dups: every gram in 2 docs
      (3L, "aa bb cc dd ee ff gg hh") // all grams unique to doc 3
    ).toDF("doc_id", "text")
    val got = DupNgramStats.fraction(docs, "doc_id", "text", k = 5)
      .select("doc_id", "n_grams", "dup_pct")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4L, 100L)) && got(2L) == ((4L, 100L)))
    assert(got(3L) == ((4L, 0L)))
  }

  test("BloomF: no false negatives ever; fpp on disjoint keys stays under 5%") {
    val bf = BloomF.empty(1 << 14, 4)
    (0L until 1000L).foreach(bf.add)
    assert((0L until 1000L).forall(bf.mightContain)) // hard guarantee
    val fp = (1000000L until 1010000L).count(bf.mightContain)
    assert(fp < 500, s"fpp too high: $fp/10000") // ~0.3% expected at this fill
  }

  test("BloomF merge is a bitwise OR: merged filter contains both sides' keys") {
    val a = BloomF.empty(1 << 12, 4)
    val b = BloomF.empty(1 << 12, 4)
    (0L until 100L).foreach(a.add)
    (100L until 200L).foreach(b.add)
    val m = a.merge(b)
    assert((0L until 200L).forall(m.mightContain))
  }

  test("BloomSemiJoin.filtered equals the plain join and prunes non-matching fact rows") {
    val fact = (1L to 2000L).map(i => (i, i % 50)).toDF("fk", "payload")
    val dim = Seq((3L, "x"), (7L, "y"), (1500L, "z")).toDF("dk", "name")
    val got = BloomSemiJoin.filtered(fact, dim, "fk", "dk")
      .select("fk", "payload", "name")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((3L, 3L, "x"), (7L, 7L, "y"), (1500L, 0L, "z")))
    // the pre-filter itself (before the join) must keep all 3 true keys and
    // pass only a small false-positive surplus
    val bfOnly = {
      val words = {
        val f = BloomF.empty(1 << 16, 4)
        Seq(3L, 7L, 1500L).foreach(f.add)
        f
      }
      fact.where(
        graft.functions.F.bloomContains(words.words, 4, col("fk"))).count()
    }
    assert(bfOnly >= 3 && bfOnly < 50)
  }

  test("DupNgramStats weights by occurrences: repeated grams inside one doc count once for df") {
    // doc 1 repeats its own gram (df must stay 1 → not duplicated)
    val docs = Seq(
      (1L, "a b c d e a b c d e"), // grams recur within the doc only
      (2L, "z y x w v u t s")
    ).toDF("doc_id", "text")
    val got = DupNgramStats.fraction(docs, "doc_id", "text", k = 5)
      .select("doc_id", "dup_pct").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) == 0L)
  }
}
