package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Redirect-chain resolution — the frontier step between fetching and
  * canonical URL identity: ~10% of real-crawl captures answer 3xx (RFC
  * 9110 §15.4), and a frontier that stores redirect SOURCES re-fetches
  * hops forever while one that follows chains eagerly must bound loops
  * (`a → b → a` is common misconfiguration) and hop counts (browsers cap
  * around 20). Input is the functional edge set a crawl's 3xx captures
  * yield — (source URL, Location) with at most one outgoing edge per
  * source — and output maps EVERY source to its final target.
  *
  * Algorithm: PATH DOUBLING — `k` self-joins resolve `2^k` hops
  * (`f ∘ f` each round on the partial function; a row whose target has
  * no outgoing edge carries forward unchanged), so the default 8-hop
  * bound costs THREE joins, not eight iterations. A source is
  * `resolved` iff its final target is not itself a redirect source —
  * anything still redirecting after `≥ maxHops` hops is a loop or an
  * over-limit chain, reported unresolved with a NULL hop count (a hop
  * count along an unterminated walk is meaningless).
  *
  * Scale shape: every join is on narrow (url, url, hops) rows keyed by
  * URL; log₂(maxHops) shuffle rounds total, each a plain equi-join AQE
  * can re-plan (a viral consent-page target skews one key — narrow rows
  * + AQE skew split keep it bounded). No iteration-to-fixpoint, no
  * driver loop over data: the round count is fixed by `maxHops` alone.
  */
object Redirects {

  /** Resolve every redirect source to its final target. Output:
    * `src`, `final_url`, `hops` (NULL when unresolved), `resolved`.
    */
  def resolve(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 1024,
      s"maxHops must be in [1, 1024], got $maxHops")
    val rounds = math.max(1,
      math.ceil(math.log(maxHops.toDouble) / math.log(2.0)).toInt)
    var f = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      lit(1L).as("hops"))
    for (_ <- 1 to rounds) {
      val g = f.select(col("src").as("g_src"), col("dst").as("g_dst"),
        col("hops").as("g_hops"))
      f = f.join(g, f("dst") === g("g_src"), "left")
        .select(f("src"),
          coalesce(col("g_dst"), f("dst")).as("dst"),
          (f("hops") + coalesce(col("g_hops"), lit(0L))).as("hops"))
    }
    val stillRedirecting = edges
      .select(col(srcCol).as("dst")).distinct()
      .withColumn("still", lit(true))
    f.join(stillRedirecting, Seq("dst"), "left")
      .select(col("src"), col("dst").as("final_url"),
        when(col("still").isNull, col("hops")).as("hops"),
        col("still").isNull.as("resolved"))
  }
}
