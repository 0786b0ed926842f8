package graft

import graft.functions.StructuredData
import org.apache.spark.sql.functions._

/** JSON-LD extraction corners (q130) — the oracle proves the plant
  * round trip; these pin the tag-scan subset and the soft-failure
  * JSON contract on hand-built pages.
  */
class StructuredDataSpec extends SparkSpec {

  private def ld(html: String): Option[String] = {
    val r = spark.range(1)
      .select(StructuredData.jsonLd(lit(html)).as("j")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }
  private def field(html: String, f: String): Option[String] = {
    val r = spark.range(1)
      .select(StructuredData.ldField(lit(html), f).as("v")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("tag scan: case-folded and attribute-reordered variants match") {
    val j = """{"@type":"Article"}"""
    assert(ld(s"""<script type="application/ld+json">$j</script>""")
      == Some(j))
    assert(ld(s"""<SCRIPT ASYNC TYPE="APPLICATION/LD+JSON">$j</SCRIPT>""")
      == Some(j))
    assert(ld(s"""<script data-x="1" type="application/ld+json">$j
      |</script>""".stripMargin).nonEmpty)
  }

  test("a decoy plain script block is never read as metadata") {
    val page = """<script>var a = {"@type":"Fake"};</script>"""
    assert(ld(page).isEmpty)
    assert(field(page, "@type").isEmpty)
    // and a decoy BEFORE a real block does not shadow it
    val both = page +
      """<script type="application/ld+json">{"@type":"Real"}</script>"""
    assert(field(both, "@type") == Some("Real"))
  }

  test("malformed JSON keeps the block countable but fields NULL") {
    val page =
      """<script type="application/ld+json">{"@type":"Art</script>"""
    assert(ld(page).nonEmpty, "block presence is independent of validity")
    assert(field(page, "@type").isEmpty)
  }

  test("first of multiple blocks wins; absent keys are NULL") {
    val page =
      """<script type="application/ld+json">{"@type":"A"}</script>""" +
      """<script type="application/ld+json">{"@type":"B"}</script>"""
    assert(field(page, "@type") == Some("A"))
    assert(field(page, "headline").isEmpty)
  }

  // ---- head metadata (q134) ------------------------------------------------

  private def one(c: org.apache.spark.sql.Column): Option[String] = {
    val r = spark.range(1).select(c.as("v")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("meta content: attribute order and case variants all match") {
    assert(one(StructuredData.metaContent(
      lit("""<meta property="og:title" content="A">"""), "og:title"))
      == Some("A"))
    assert(one(StructuredData.metaContent(
      lit("""<META CONTENT="B" PROPERTY="OG:TITLE">"""), "og:title"))
      == Some("B"))
    assert(one(StructuredData.metaContent(
      lit("""<meta name="description" content="C">"""), "description"))
      == Some("C"))
  }

  test("a key inside another tag's VALUE never matches; malformed tag is NULL") {
    // the decoy: content mentions og:title but the tag's key is generator
    assert(one(StructuredData.metaContent(
      lit("""<meta name="generator" content="og:title decoy">"""),
      "og:title")).isEmpty)
    // present tag, missing content attribute — countable but NULL value
    assert(one(StructuredData.metaContent(
      lit("""<meta property="og:title">"""), "og:title")).isEmpty)
  }

  test("feed autodiscovery pairs rel=alternate and the media type in ONE tag") {
    val fl = (h: String) => spark.range(1)
      .select(StructuredData.feedLink(lit(h)).as("f"))
      .select(col("f.url"), col("f.fmt")).head()
    // rel on one tag, type on another: no feed
    val split = fl("""<link rel="alternate" type="text/html" href="a">""" +
      """<link type="application/rss+xml" href="b">""")
    assert(split.isNullAt(0) && split.isNullAt(1))
    // reordered attributes still pair up
    val atom = fl(
      """<link type="application/atom+xml" href="u" rel="alternate">""")
    assert(atom.getString(0) == "u" && atom.getString(1) == "atom")
    val rss = fl(
      """<link rel="alternate" type="application/rss+xml" href="r">""")
    assert(rss.getString(0) == "r" && rss.getString(1) == "rss")
  }

  test("link href: case-folded rel match, raw href preserved") {
    assert(one(StructuredData.linkHref(
      lit("""<LINK REL="canonical" HREF="http://x/P?Q=1">"""), "canonical"))
      == Some("http://x/P?Q=1"))
    assert(one(StructuredData.linkHref(
      lit("""<link rel="stylesheet" href="s.css">"""), "canonical")).isEmpty)
  }
}
