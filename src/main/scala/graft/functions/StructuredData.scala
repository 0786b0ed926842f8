package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structured-data (schema.org JSON-LD) extraction from HTML — the
  * `<script type="application/ld+json">` convention (public: the W3C
  * JSON-LD recommendation + schema.org's documented embedding), the
  * richest page-metadata channel a web corpus carries: article
  * headlines, publish dates, and typed entities that survive after the
  * visible text is boilerplate-stripped. A training pipeline uses these
  * as document METADATA (dates for dedup recency keepers — q69; types
  * for corpus stratification — q57/q117) without trusting page prose.
  *
  * Parsing posture (the [[RobotsMeta]] discipline): the script-tag scan
  * is attribute-order-robust and case-insensitive over the
  * double-quoted subset, and the payload rides Spark's built-in JSON
  * path evaluation (`get_json_object` — codegen, no UDF), so malformed
  * JSON degrades to NULL FIELDS while the block's presence stays
  * countable — extraction never throws on adversarial markup. Ordinary
  * `<script>` blocks (no ld+json type) are never read: a decoy
  * `{"@type": ...}` inside application code must not become metadata.
  * One map-side pass, zero shuffles.
  */
object StructuredData {

  /** The FIRST `application/ld+json` script payload, or NULL when the
    * page carries none. (Multiple blocks are legal; the first is the
    * established primary-entity convention, and callers needing all
    * can regexp_extract_all the same pattern.)
    */
  def jsonLd(html: Column): Column = {
    val pat = "(?is)<script\\b[^>]*type\\s*=\\s*\"application/ld\\+json\"" +
      "[^>]*>(.*?)</script>"
    val m = regexp_extract(html, pat, 1)
    when(m =!= "", m)
  }

  /** A JSON-LD string field by name (NULL on absent block, absent key,
    * or malformed JSON — get_json_object's soft-failure contract).
    */
  def ldField(html: Column, field: String): Column =
    get_json_object(jsonLd(html), s"$$['$field']")
}
