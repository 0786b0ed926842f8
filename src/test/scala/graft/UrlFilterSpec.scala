package graft

import graft.functions.UrlFilter
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Kernel-level coverage for the URL quality filter — q119's oracle proves
  * the composition over the planted fixture; these pin the per-rule
  * semantics the fixture reaches only in aggregate, above all the
  * soft-vs-strict match-mode split (whole-token lookup must NOT behave as
  * substring banning, and vice versa) and the exact integer boundaries.
  */
class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private def row(url: String,
      block: Seq[String] = Nil,
      broadcastBlocklist: Boolean = true): Row = {
    val docs = Seq((1L, url)).toDF("doc_id", "url")
    val dim = block.toDF("host")
    UrlFilter.evaluate(docs, "doc_id", "url", dim,
      broadcastBlocklist = broadcastBlocklist).collect()(0)
  }

  test("soft words count as whole tokens only — no scunthorpe effect") {
    // "casinos" and "pokerface" contain soft words as substrings but are
    // different tokens; the weighted score must stay 0
    val r = row("http://ok.example/casinos/pokerface")
    assert(r.getAs[Long]("badword_score") == 0L)
    assert(r.getAs[Boolean]("url_ok"))
    // the same words as standalone tokens sum their weights (40+30=70)
    val r2 = row("http://ok.example/casino/poker")
    assert(r2.getAs[Long]("badword_score") == 70L)
    assert(!r2.getAs[Boolean]("r_badwords") && !r2.getAs[Boolean]("url_ok"))
  }

  test("strict words count on containment inside longer tokens") {
    val r = row("http://ok.example/a/pXXX4")          // lowercased first
    assert(r.getAs[Long]("badword_score") == 100L)
    assert(!r.getAs[Boolean]("r_badwords"))
    // soft and strict accumulate: casino(40) + xxx(100)
    val r2 = row("http://ok.example/casino/xxx")
    assert(r2.getAs[Long]("badword_score") == 140L)
  }

  test("threshold is a strict less-than: 59 keeps, exactly 60 filters") {
    def scored(w: Int): Row = {
      val docs = Seq((1L, "http://ok.example/edge")).toDF("doc_id", "url")
      UrlFilter.evaluate(docs, "doc_id", "url", Seq.empty[String].toDF("host"),
        soft = Seq("edge" -> w)).collect()(0)
    }
    assert(scored(59).getAs[Boolean]("r_badwords"))
    assert(!scored(60).getAs[Boolean]("r_badwords"))
  }

  test("blocklist bans the exact host AND its subdomains, never siblings") {
    val r = row("http://bad.example/news", block = Seq("bad.example"))
    assert(r.getAs[Boolean]("blocked_domain") && !r.getAs[Boolean]("url_ok"))
    // a subdomain of a banned host is banned via the parent-suffix chain
    val r2 = row("http://sub.bad.example/news", block = Seq("bad.example"))
    assert(!r2.getAs[Boolean]("blocked_domain") &&
      r2.getAs[Boolean]("blocked_parent") && !r2.getAs[Boolean]("url_ok"))
    // deep subdomains stay banned (every proper suffix is in the window)
    val r3 = row("http://a.b.sub.bad.example/x", block = Seq("bad.example"))
    assert(r3.getAs[Boolean]("blocked_parent"))
    // a LONGER host that merely ends in the banned string without a
    // label boundary is NOT banned: notbad.example vs bad.example
    val r4 = row("http://notbad.example/news", block = Seq("bad.example"))
    assert(!r4.getAs[Boolean]("blocked_domain") &&
      !r4.getAs[Boolean]("blocked_parent") && r4.getAs[Boolean]("url_ok"))
    // sibling hosts pass; and a banned SUBDOMAIN never bans its parent
    val r5 = row("http://bad.example/news", block = Seq("sub.bad.example"))
    assert(!r5.getAs[Boolean]("blocked_domain") &&
      !r5.getAs[Boolean]("blocked_parent") && r5.getAs[Boolean]("url_ok"))
    // an 8-label host (deeper than anything r_depth admits): the
    // 2-label banned suffix is the FIRST window entry, so
    // blocked_parent still fires even where depth already fails —
    // exposed columns never lean on r_depth masking them
    val r6 = row("http://a.b.c.d.e.f.bad.example/x",
      block = Seq("bad.example"))
    assert(r6.getAs[Boolean]("blocked_parent") &&
      !r6.getAs[Boolean]("r_depth") && !r6.getAs[Boolean]("url_ok"))
  }

  test("duplicate blocklist entries never duplicate frontier rows") {
    // flag-producing LEFT joins against a dim with repeated hosts must
    // dedupe the dim, not multiply the URL side
    val docs = Seq((1L, "http://a.bad.example/x"),
      (2L, "http://ok.example/y")).toDF("doc_id", "url")
    val dim = Seq("bad.example", "bad.example", "bad.example").toDF("host")
    val out = UrlFilter.evaluate(docs, "doc_id", "url", dim).collect()
    assert(out.length == 2, s"row multiplication: ${out.length} rows")
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("blocked_parent"))
    assert(byId(2L).getAs[Boolean]("url_ok"))
  }

  test("schemeless URLs fail the explicit r_has_host rule, nothing else") {
    val r = row("www.site.example/news/1")
    assert(r.getAs[String]("host") == "" && r.getAs[Long]("host_len") == 0L)
    assert(!r.getAs[Boolean]("r_has_host") && !r.getAs[Boolean]("url_ok"))
    // the digit-host rule is vacuously TRUE for empty hosts — the
    // rejection reason stays attributable to r_has_host alone
    assert(r.getAs[Boolean]("r_digit_host"))
    assert(r.getAs[Boolean]("r_blocklist") && r.getAs[Boolean]("r_depth"))
  }

  test("digit-host bound 10*digits < 3*len at the integer boundary") {
    // host "a12345678.example": len 17, digits 8 → 80 < 51 false → filtered
    val r = row("http://a12345678.example/x")
    assert(r.getAs[Long]("n_host_digits") == 8L && !r.getAs[Boolean]("r_digit_host"))
    // "a12.example": len 11, digits 2 → 20 < 33 true → kept
    val r2 = row("http://a12.example/x")
    assert(r2.getAs[Boolean]("r_digit_host") && r2.getAs[Boolean]("url_ok"))
  }

  test("subdomain depth gates above 4 dots; host stops at port") {
    assert(row("http://a.b.c.site.example/x").getAs[Boolean]("r_depth"))
    val r = row("http://a.b.c.d.site.example/x")
    assert(r.getAs[Long]("n_host_dots") == 5L && !r.getAs[Boolean]("r_depth"))
    assert(row("http://h.example:8080/x").getAs[String]("host") == "h.example")
  }

  test("blocklist dim rides a broadcast hash join by default") {
    val docs = Seq((1L, "http://h.example/x")).toDF("doc_id", "url")
    val dim = Seq("bad.example").toDF("host")
    val p = UrlFilter.evaluate(docs, "doc_id", "url", dim)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    val p2 = UrlFilter.evaluate(docs, "doc_id", "url", dim,
      broadcastBlocklist = false).queryExecution.executedPlan.toString
    assert(!p2.contains("broadcast(") || p2.contains("BroadcastHashJoin"),
      "no-hint mode must not force a broadcast hint of its own")
  }
}
