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
}
