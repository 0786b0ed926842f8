package graft

import graft.functions.HtmlText
import org.apache.spark.sql.functions._

/** Kernel-level coverage for the HTML → visible-text extractor. Each test
  * targets one documented rule — the q103 oracle proves the composition on
  * real data; these pin the edge semantics (torn markup, quote-aware tag
  * ends, entity strictness) the fixture can't reach one at a time.
  */
class HtmlTextSpec extends SparkSpec {

  private def extract(html: String): String = {
    val rows = spark.range(1)
      .select(HtmlText.extract(lit(html)).as("t")).collect()
    rows(0).getString(0)
  }

  test("block tags break lines; inline tags do not") {
    assert(extract("one<br>two <b>three</b><p>four</p>") ==
      "one\ntwo three\nfour")
  }

  test("script and style content never leaks, including tags inside") {
    assert(extract(
      "a<script>if(1<2){var s=\"</div>\";}</script>b<style>p{}</style>c")
      == "abc")
    // torn raw text swallows the tail, never throws
    assert(extract("a<script>var x = 1;") == "a")
  }

  test("head content drops; recovery at an implicit <body>") {
    assert(extract("<head><title>T</title></head><body>x</body>") == "x")
    assert(extract("<head><title>T</title><body>x</body>") == "x")
    assert(extract("<head><title>T</title>") == "")
  }

  test("comments drop; unterminated comment swallows the tail") {
    assert(extract("a<!-- b <p>c</p> -->d") == "ad")
    assert(extract("a<!-- b") == "a")
  }

  test("quote-aware tag end: '>' inside a quoted attribute") {
    assert(extract("<a href=\"x\" title=\"a>b\">link</a>") == "link")
    assert(extract("<a title='a>b'>link</a>") == "link")
  }

  test("'<' before a non-tag character is literal text") {
    assert(extract("x < y and x <3 z") == "x < y and x <3 z")
  }

  test("declarations and processing instructions drop") {
    assert(extract("<!DOCTYPE html><?xml version=\"1.0\"?>x") == "x")
  }

  test("whitespace: runs collapse, lines trim, empties drop") {
    assert(extract("<p>  a\t b </p><p></p><p> c </p>") == "a b\nc")
    assert(extract("<p></p>") == "")
  }

  test("entities decode strictly, after tag removal") {
    assert(extract("&amp; &lt;b&gt;x&lt;/b&gt; &#233; &#x41; &copy;") ==
      "& <b>x</b> é A ©")
    // no semicolon / unknown name / bad numerics pass through literally
    assert(extract("a &amp b &zzz; c &#; d &#x110000; e &#xD800; f") ==
      "a &amp b &zzz; c &#; d &#x110000; e &#xD800; f")
    // nbsp is a real U+00A0, preserved (decode runs after the ws pass)
    assert(extract("a&nbsp;b") == "a b")
  }

  test("null in, null out; empty in, empty out") {
    val r = spark.range(1).select(
      HtmlText.extract(lit(null).cast("string")).as("n"),
      HtmlText.extract(lit("")).as("e")).collect()(0)
    assert(r.isNullAt(0) && r.getString(1) == "")
  }
}
