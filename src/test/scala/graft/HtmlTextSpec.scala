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

  test("raw-text terminators require a tag-name boundary (HTML5)") {
    // r11 ADVICE: </scripty must NOT end a <script> skip — only
    // </script followed by '>', '/' or whitespace is the close tag
    assert(extract("a<script>var s='</scripty';x=1;</script>b") == "ab")
    assert(extract("a<script>y</script >b") == "ab")
    assert(extract("a<style>s{}</styles>t{}</style>b") == "ab")
    // </header is NOT </head; <bodyx is NOT an implicit <body
    assert(extract("<head><title>T</title></header></head><body>x") == "x")
    assert(extract("<head><title>T</title><bodyx><body>x") == "x")
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

  test("source newlines are inter-word space, not line breaks — both kernels") {
    // pretty-printed HTML: the paragraph is ONE line in both the full
    // extraction and the line-wise filter (r11 review: the forked
    // scanner treated '\n' as content in one and a break in the other)
    val pretty = "<p>foo\nbar baz qux quux words enough</p>"
    assert(extract(pretty) == "foo bar baz qux quux words enough")
    assert(main(pretty) == "foo bar baz qux quux words enough")
    val r = spark.range(1)
      .select(HtmlText.keptLineCount(lit(pretty)).as("k")).collect()(0)
    assert(r.getInt(0) == 1)
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

  private def main(html: String, pct: Int = 50, min: Int = 12): String = {
    val rows = spark.range(1)
      .select(HtmlText.mainContent(lit(html), pct, min).as("t")).collect()
    rows(0).getString(0)
  }

  test("main content: link-dominated lines drop, prose survives") {
    val page = "<nav><a href=\"/\">Home</a> | <a href=\"/a\">About</a></nav>" +
      "<p>this paragraph is long enough to keep and has no links</p>" +
      "<footer><a href=\"/t\">Terms</a> <a href=\"/p\">Privacy</a></footer>"
    assert(main(page) ==
      "this paragraph is long enough to keep and has no links")
  }

  test("main content: a prose line with an inline link still survives") {
    val page = "<p>read the <a href=\"/d\">details</a> in this long sentence" +
      " of mostly prose</p>"
    assert(main(page) == "read the details in this long sentence of mostly prose")
  }

  test("main content: short fragments drop by min length") {
    assert(main("<h1>Doc 7</h1><p>a line that is clearly long enough</p>") ==
      "a line that is clearly long enough")
  }

  test("main content: thresholds apply before entity decode") {
    // '&amp;&amp;' is 10 chars pre-decode (passes min 8), decodes to '&&'
    assert(main("<p>&amp;&amp;</p>", 50, 8) == "&&")
    // pre-decode length rules: 'ab&lt;&gt;' is 10 chars (4 decoded) —
    // passes min 10 exactly, fails min 11
    assert(main("<p>ab&lt;&gt;</p>", 50, 10) == "ab<>")
    assert(main("<p>ab&lt;&gt;</p>", 50, 11) == "")
  }

  test("main content: nested and unbalanced anchors never crash the depth") {
    val page = "<p></a></a>plain text that is long enough here</p>" +
      "<p><a><a><b>all of this text sits inside anchors</b></a></a></p>"
    assert(main(page) == "plain text that is long enough here")
  }

  test("kept-line count matches the surviving lines") {
    val page = "<nav><a href=\"/\">Home page link row</a></nav>" +
      "<p>first real paragraph of content</p>" +
      "<p>second real paragraph of content</p>"
    val r = spark.range(1).select(
      HtmlText.keptLineCount(lit(page)).as("k"),
      HtmlText.keptLineCount(lit(null).cast("string")).as("n")).collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == -1)
  }

  test("table rows/cells: th+td mix, markup strip, trim, no-table empty") {
    import org.apache.spark.sql.functions.col
    val page = "<p>intro</p><table>" +
      "<TR><th class=\"h\"> Name </th><th> N </th></TR>" +
      "<tr><td><b>alpha</b> one</td><td> 1 </td></tr></table>"
    val rows = spark.range(1)
      .select(HtmlText.tableRows(lit(page)).as("r"))
      .selectExpr("explode(r) as row")
      .select(HtmlText.rowCells(col("row")).as("c"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(rows.length == 2)
    assert(rows(0) == Seq("Name", "N"), s"header row: ${rows(0)}")
    assert(rows(1) == Seq("alpha one", "1"), s"data row: ${rows(1)}")
    val none = spark.range(1)
      .select(HtmlText.tableRows(lit("<p>no tables here</p>")).as("r"))
      .head().getSeq[String](0)
    assert(none.isEmpty)
  }

  // ---- markdown conversion (q138) ------------------------------------------

  private def md(html: String): String = spark.range(1)
    .select(HtmlText.toMarkdown(lit(html)).as("m")).head().getString(0)

  test("markdown: headings, inline spans, bullets, entities") {
    val page = "<html><body><h2>T</h2>" +
      "<p>A <strong>b</strong> &amp; <em>i</em> <a href=\"u\">l</a>.</p>" +
      "<ul><li>one</li><li>two</li></ul></body></html>"
    assert(md(page) ==
      "## T\n\nA **b** & *i* [l](u).\n\n- one\n- two")
  }

  test("markdown: script/style content elided, unknown tags strip to space") {
    val page = "<div><script>var x = \"<h1>no</h1>\";</script>" +
      "<p>kept</p><style>p{color:red}</style></div>"
    assert(md(page) == "kept")
  }

  test("markdown: torn structural tags degrade to plain text, never throw") {
    assert(md("<html><body><h1>Torn page</body></html>") == "Torn page")
    assert(md("<p>open only") == "open only")
  }

  test("markdown: br breaks a line, blank runs collapse to one blank line") {
    assert(md("<p>a<br>b</p><p>c</p>") == "a\nb\n\nc")
  }

  test("markdown: tables render as GFM pipes with a first-row separator") {
    val page = "<p>Pre.</p><table><tr><th>A</th><th>B</th></tr>" +
      "<tr><td>1</td><td> 2 <b>x</b> </td></tr>" +
      "<tr><td>3</td><td>4</td></tr></table><p>Post.</p>"
    assert(md(page) ==
      "Pre.\n\n| A | B |\n| --- | --- |\n| 1 | 2 **x** |\n| 3 | 4 |" +
        "\n\nPost.",
      "inline spans must be converted INSIDE cells, whitespace collapsed")
    // a data-only table still gets the separator after its first row
    assert(md("<table><tr><td>a</td></tr><tr><td>b</td></tr></table>") ==
      "| a |\n| --- |\n| b |")
    // no usable rows -> the block strips to nothing, like any other tag
    assert(md("x<table><tr></tr></table>y") == "x y")
  }

  test("markdown: nested lists indent two spaces per level, cap at 8") {
    val page = "<ul><li>o0<ul><li>n0</li><li>n1</li></ul></li>" +
      "<li>o1</li></ul>"
    assert(md(page) == "- o0\n  - n0\n  - n1\n- o1")
    // ol nests identically (bullets for both — documented subset)
    assert(md("<ol><li>a<ol><li>b</li></ol></li></ol>") == "- a\n  - b")
    // unmatched closers never push depth negative; a following flat
    // list renders unindented
    assert(md("</ul></ul><ul><li>z</li></ul>") == "- z")
    // hostile unclosed-open run: indentation caps at 8 levels (a
    // document-LEADING nested item would additionally lose its indent
    // to the final trim — acceptable degradation of malformed input)
    val bomb = "<ul><li>p" + "<ul>" * 40 + "<li>deep</li>"
    assert(md(bomb) == "- p\n" + " " * 16 + "- deep")
  }

  test("markdown: a literal U+0001 in input can never forge indentation") {
    assert(md("<p>ab</p><ul><li>x</li></ul>") == "a b\n\n- x")
  }
}
