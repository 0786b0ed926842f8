package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-based document filtering — the RefinedWeb §3.1.2 posture (Penedo et
  * al. 2023, public), the first gate a web corpus applies because it needs
  * no page bytes at all: judge the document by its URL.
  *
  * Three independent signals, composed into one verdict:
  *
  *  1. '''Domain blocklist''' — a curated banned-host dim (the public
  *     UT1-style aggregated lists run to ~4.6M domains). Joined as a DIM,
  *     not folded into the expression tree: a 4.6M-row list is data, and
  *     the join is a broadcast hash join while the list fits the broadcast
  *     budget (~100 MB of hosts does). An entry bans the host AND its
  *     subdomains: the URL side joins its bounded parent-suffix chain
  *     (≤ [[UrlFilter.MaxSuffixJoins]] proper suffixes, map-side column
  *     arithmetic) against the same dim, because UT1-class lists mean
  *     `example.com` as `*.example.com` and pre-expanding subdomains is
  *     unbounded. `broadcastBlocklist = false` drops the hints for larger
  *     lists and lets AQE pick the exchange — the frontier side shuffles
  *     on `host`, which co-locates with the q107 per-host rollup if both
  *     run.
  *  2. '''Weighted bad-word score''' — a small severity-weighted vocabulary
  *     in two match modes, mirroring the public soft/strict split: STRICT
  *     words count on substring containment anywhere in the URL (spam
  *     hosts embed them inside longer tokens exactly to dodge word
  *     matching), SOFT words only as whole `[a-z0-9]+` tokens (so
  *     "scunthorpe" never trips a soft "porn"-class entry). The score is
  *     an integer sum; the keep rule is `score < threshold`. Soft lookup
  *     is a literal-map `element_at` inside one `aggregate` lambda over
  *     the token split (the lambda touches only its bound variable — the
  *     O(n²) re-evaluation lesson); strict terms are a fixed `contains`
  *     chain. Vocabularies beyond a few thousand entries should move to
  *     the dim-join pattern of signal 1 instead of the expression tree.
  *  3. '''Host-shape heuristics''' — integer cross-multiplied bounds, no
  *     float thresholds for engines to disagree on: digit-heavy hosts
  *     (10·digits < 3·len, the DGA/SEO-spam shape) and subdomain depth
  *     (dots ≤ 4).
  *
  * Everything except the blocklist join is one map-side whole-stage-codegen
  * pass; counters are emitted alongside the verdicts so a re-threshold
  * needs no re-scan. Reference analog: the explicit allow/deny posture of
  * the robots gate (helpers.py:22 fetches what this module decides to
  * fetch at all).
  */
object UrlFilter {

  /** Default severity weights (public-flavored miniature of the UT1
    * adult/gambling/pharma categories; real deployments load their own).
    */
  val DefaultSoft: Seq[(String, Int)] =
    Seq("casino" -> 40, "poker" -> 30, "pills" -> 50)
  val DefaultStrict: Seq[(String, Int)] = Seq("xxx" -> 100, "porn" -> 100)
  val DefaultThreshold = 60
  val MaxHostDots = 4

  /** Lowercased host of a URL: the authority up to the first `:` `/` `?`
    * `#`. Userinfo is not stripped (crawl frontiers don't carry it); the
    * DuckDB oracle replays this exact regex.
    */
  def hostOf(url: Column): Column =
    regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** How many PROPER parent-suffix joins [[evaluate]] runs — DERIVED
    * from [[MaxHostDots]] so the window is exhaustive by construction
    * for every host that can pass `r_depth` (≤ MaxHostDots+1 labels ⇒
    * ≤ MaxHostDots−1 proper suffixes of ≥ 2 labels, with slack).
    * `blocked_parent` is therefore DEFINED as "a banned host among the
    * [[MaxSuffixJoins]] shortest proper suffixes": hosts deeper than
    * the window can only miss a banned suffix of ≥ MaxSuffixJoins+2
    * labels — blocklists ban short registrable suffixes
    * (`example.com`), which are always the FIRST entries of the
    * shortest-first window, so that shape doesn't occur in real lists,
    * and the q119 oracle replays this exact bounded window (not an
    * unbounded LIKE) so engine and oracle agree on EVERY host, 8+
    * labels included.
    */
  val MaxSuffixJoins: Int = MaxHostDots + 1

  /** Per-URL verdict battery. `blockDim` must expose a `host` column of
    * banned hosts. An entry bans the exact host AND every subdomain of
    * it (`example.com` bans `a.b.example.com`): each URL's bounded
    * parent-suffix chain — at most [[MaxSuffixJoins]] proper suffixes of
    * ≥ 2 labels, shortest (most registrable) first — joins against the
    * dim as extra broadcast hash joins, so the list never needs
    * subdomain pre-expansion (you can't enumerate subdomains you haven't
    * crawled). All blocklist joins are map-side while the dim
    * broadcasts; `broadcastBlocklist = false` drops the hints for lists
    * past the broadcast budget (the joins then shuffle on their keys —
    * for a dim THAT large, prefer pre-bucketing it by host).
    */
  def evaluate(docs: DataFrame, idCol: String, urlCol: String,
      blockDim: DataFrame,
      soft: Seq[(String, Int)] = DefaultSoft,
      strict: Seq[(String, Int)] = DefaultStrict,
      scoreThreshold: Int = DefaultThreshold,
      broadcastBlocklist: Boolean = true): DataFrame =
    annotate(docs.select(col(idCol).as("doc_id"), col(urlCol)), urlCol,
      blockDim, soft, strict, scoreThreshold, broadcastBlocklist)
      .drop(urlCol)

  /** [[evaluate]]'s column-preserving sibling: appends the counter and
    * verdict columns (`host`, `host_len`, `n_host_digits`,
    * `n_host_dots`, `badword_score`, `blocked_domain`, `blocked_parent`,
    * the `r_*` rules, `url_ok`) to `docs` WITHOUT projecting anything
    * away — the surface a streaming twin (or any pipeline stage that
    * must keep its own columns) gates with, so stream ≡ batch verdicts
    * are the same expression tree by construction. `docs` must not
    * already carry those column names.
    */
  def annotate(docs: DataFrame, urlCol: String, blockDim: DataFrame,
      soft: Seq[(String, Int)] = DefaultSoft,
      strict: Seq[(String, Int)] = DefaultStrict,
      scoreThreshold: Int = DefaultThreshold,
      broadcastBlocklist: Boolean = true): DataFrame = {
    val lurl = lower(col(urlCol))
    val tokens = split(lurl, "[^a-z0-9]+")
    val softMap = map(soft.flatMap { case (w, v) =>
      Seq(lit(w), lit(v.toLong)) }: _*)
    val softScore = aggregate(tokens, lit(0L),
      (acc, t) => acc + coalesce(element_at(softMap, t), lit(0L)))
    val strictScore = strict.map { case (w, v) =>
      when(contains(lurl, lit(w)), lit(v.toLong)).otherwise(0L)
    }.reduceOption(_ + _).getOrElse(lit(0L))

    // the i-th SHORTEST proper suffix of the host with ≥ 2 labels
    // (i=1 → the registrable-looking `example.com` end), NULL when the
    // host has no i-th proper suffix — NULL keys simply never match
    val labels = split(col("host"), "\\.")
    val nLab = size(labels)
    def sfx(i: Int): Column =
      when(lit(i) <= nLab - 2,
        array_join(slice(labels, nLab - i, lit(i + 1)), "."))

    val scored = (1 to MaxSuffixJoins).foldLeft(
      docs
        .withColumn("host", hostOf(col(urlCol)))
        .withColumn("host_len", length(col("host")).cast("long"))
        .withColumn("n_host_digits",
          length(regexp_replace(col("host"), "[^0-9]", "")).cast("long"))
        .withColumn("n_host_dots",
          (length(col("host")) - length(translate(col("host"), ".", "")))
            .cast("long"))
        .withColumn("badword_score", softScore + strictScore)
    ) { (df, i) => df.withColumn(s"_sfx$i", sfx(i)) }

    // dedupe the dim ONCE: these are flag-producing LEFT joins, so a
    // duplicated blocklist entry (real aggregated lists carry them)
    // would silently duplicate frontier rows. One small exchange; the
    // per-suffix broadcasts then reuse the same deduped relation.
    val uniq = blockDim.select(col("host")).distinct()
    def dim(as: String): DataFrame = {
      val d = uniq.select(col("host").as(as))
      if (broadcastBlocklist) broadcast(d) else d
    }
    val exact = scored.join(dim("_bh0"), col("host") === col("_bh0"), "left")
    val joined = (1 to MaxSuffixJoins).foldLeft(exact) { (df, i) =>
      df.join(dim(s"_bh$i"), col(s"_sfx$i") === col(s"_bh$i"), "left")
    }
    joined
      .withColumn("blocked_domain", col("_bh0").isNotNull)
      .withColumn("blocked_parent",
        (1 to MaxSuffixJoins).map(i => col(s"_bh$i").isNotNull)
          .reduce(_ || _))
      .drop("_bh0" +: (1 to MaxSuffixJoins)
        .flatMap(i => Seq(s"_sfx$i", s"_bh$i")): _*)
      .withColumn("r_has_host", col("host_len") > 0L)
      .withColumn("r_blocklist",
        !(col("blocked_domain") || col("blocked_parent")))
      .withColumn("r_badwords", col("badword_score") < scoreThreshold.toLong)
      // vacuously true for empty hosts: a schemeless URL is rejected by
      // the explicit r_has_host rule, not mislabeled digit-heavy
      // (ADVICE r12 — rejection reasons stay attributable)
      .withColumn("r_digit_host", col("host_len") === 0L ||
        col("n_host_digits") * 10L < col("host_len") * 3L)
      .withColumn("r_depth", col("n_host_dots") <= MaxHostDots.toLong)
      .withColumn("url_ok",
        col("r_has_host") && col("r_blocklist") && col("r_badwords") &&
        col("r_digit_host") && col("r_depth"))
  }
}
