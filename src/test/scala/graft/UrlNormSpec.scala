package graft

import graft.functions.UrlNorm
import org.apache.spark.sql.functions._

/** Kernel-level coverage for URL canonicalization — q104's oracle proves
  * the composition over the planted variants; these pin each documented
  * rule on its own, especially the ones the fixture can't reach (IPv6
  * authority, malformed ports, traversal-safe decode ordering).
  */
class UrlNormSpec extends SparkSpec {

  private def canon(url: String): String = {
    val r = spark.range(1)
      .select(UrlNorm.canonicalize(lit(url)).as("u")).collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("scheme/host lowercase; default port and userinfo drop") {
    assert(canon("HTTP://User:Pw@Site.EXAMPLE:80/A/b") ==
      "http://site.example/A/b")
    assert(canon("https://x.example:443/") == "https://x.example/")
    assert(canon("http://x.example:8080/p") == "http://x.example:8080/p")
  }

  test("dot segments resolve on literal segments") {
    assert(canon("http://h.example/a/./b/../c") == "http://h.example/a/c")
    assert(canon("http://h.example/../../a") == "http://h.example/a")
    assert(canon("http://h.example/a/b/..") == "http://h.example/a/")
    assert(canon("http://h.example/a/") == "http://h.example/a/")
    assert(canon("http://h.example") == "http://h.example/")
  }

  test("empty path segments are preserved (RFC 3986: // is not /)") {
    // r11 ADVICE: collapsing // merged distinct resources; §5.2.4
    // elides only dot segments
    assert(canon("http://h.example/a//b") == "http://h.example/a//b")
    assert(canon("http://h.example//a") == "http://h.example//a")
    assert(canon("http://h.example/a//") == "http://h.example/a//")
    // .. consumes the preceding segment, empty included (rule 2C)
    assert(canon("http://h.example/a//../b") == "http://h.example/a/b")
    assert(canon("http://h.example/a//..") == "http://h.example/a/")
    assert(canon("http://h.example/a///..") == "http://h.example/a//")
  }

  test("percent: unreserved decodes, others uppercase, malformed literal") {
    assert(canon("http://h.example/%61%2Fb%7e") == "http://h.example/a%2Fb~")
    assert(canon("http://h.example/a%2") == "http://h.example/a%2")
    assert(canon("http://h.example/a%zz") == "http://h.example/a%zz")
  }

  test("decoded %2E is never re-interpreted as a dot segment") {
    assert(canon("http://h.example/a/%2E%2E/secret") ==
      "http://h.example/a/../secret")
  }

  test("fragment drops; empty query drops; non-empty query normalizes") {
    assert(canon("http://h.example/p#frag") == "http://h.example/p")
    assert(canon("http://h.example/p?") == "http://h.example/p")
    assert(canon("http://h.example/p?k=%61&x=%2F") ==
      "http://h.example/p?k=a&x=%2F")
  }

  test("non-http(s), relative, empty-host and bad-port inputs → NULL") {
    assert(canon("ftp://h.example/a") == null)
    assert(canon("/relative/path") == null)
    assert(canon("mailto:x@y.example") == null)
    assert(canon("http:///a") == null)
    assert(canon("http://h.example:8o80/a") == null)
  }

  test("IPv6 literal authority: lowercased whole, port spelling kept") {
    assert(canon("http://[2001:DB8::1]:80/a") == "http://[2001:db8::1]:80/a")
  }
}
