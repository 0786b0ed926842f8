package graft

import graft.sources.Sitemap
import org.apache.spark.sql.functions._

/** Kernel-level coverage for the sitemap body decode — q110's oracle
  * proves the composed parse (index recursion, gzip, canonicalization);
  * these pin the byte-level edge cases the fixture can't isolate.
  */
class SitemapSpec extends SparkSpec {

  private def roundtrip(xml: String): String = {
    val r = spark.range(1)
      .select(Sitemap.bodyText(Sitemap.gzipUtf8(lit(xml))).as("t"))
      .collect()(0)
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("gzip bodies sniff and inflate; plain bodies pass through") {
    val xml = "<?xml version=\"1.0\"?><urlset><url><loc>http://h.example/a" +
      "</loc></url></urlset>"
    assert(roundtrip(xml) == xml)
    val plain = spark.range(1)
      .select(Sitemap.bodyText(lit(xml).cast("binary")).as("t"))
      .collect()(0).getString(0)
    assert(plain == xml)
  }

  test("torn gzip and malformed UTF-8 yield NULL, never half-decoded markup") {
    val kernel = Sitemap.bodyTextKernel _
    val good = Sitemap.gzipUtf8Kernel(
      org.apache.spark.unsafe.types.UTF8String.fromString("<urlset/>"))
    assert(kernel(good).toString == "<urlset/>")
    // torn member: drop the tail past the gzip header
    assert(kernel(good.dropRight(6)) == null)
    // plain bytes that are not valid UTF-8
    assert(kernel(Array[Byte](0x3c, -1, -2, 0x3e)) == null)
    assert(kernel(null) == null)
  }

  test("non-ASCII survives the gzip roundtrip byte-exactly") {
    val xml = "<urlset><url><loc>http://h.example/ż–✓</loc></url></urlset>"
    assert(roundtrip(xml) == xml)
  }
}
