package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom feed-item extraction — the structured change-signal
  * channel a crawler reads beside the page itself (RSS 2.0 spec, RFC
  * 4287): one row per `<item>`/`<entry>` with title, link, and the
  * publish timestamp. Factored out of the q135 entry so the q144
  * feed→recrawl composition consumes the SAME parse (reference analog:
  * the reference ingests published per-month drops — helpers.py:22 —
  * where a crawler's equivalent freshness signal is the feed).
  *
  * Subset bounds (documented, mirrored by the oracle): well-formed
  * item/entry blocks located by non-greedy block regexes; RSS
  * `<pubDate>` in the conventional RFC 822 shapes — an OPTIONAL
  * `EEE, ` day-of-week prefix (stripped without validation, the lenient
  * posture every feed reader takes) followed by `dd MMM yyyy HH:mm:ss`
  * and either the `GMT` zone name or a numeric `+hhmm`/`-hhmm` offset
  * (honored: the instant converts to UTC, not merely stripped); the day
  * may be one or two digits (`2 Jun` and `02 Jun` both parse — the `d`
  * pattern). Atom `<updated>` is ISO `yyyy-MM-dd'T'HH:mm:ss'Z'`. Still
  * outside the subset: two-digit years and the obsolete alphabetic
  * zones (`UT`, `EST`) RFC 2822 deprecates — those degrade to NULL
  * pub_ts, never a throw. A torn or non-feed document
  * yields zero rows (`feed_format` NULL routes it). Everything
  * is one map-side pass of codegen'd regex/timestamp built-ins — zero
  * shuffles, zero UDFs; at 100 TB the feed corpus rides the same
  * partition-parallel scan as any text column.
  */
object Feeds {

  /** Parsed items of a DECODED feed document (apply [[Sitemap.bodyText]]
    * first when bodies may be gzipped). Output: idCol, feed_format
    * (rss|atom|NULL), item_idx, title, url, pub_ts (timestamp, NULL when
    * the item carries no parseable date).
    */
  def items(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val xml = col(xmlCol)
    val fmtCol = when(xml.rlike("(?s)<rss\\b"), lit("rss"))
      .when(xml.rlike("(?s)<feed\\b"), lit("atom"))
    val b = col("b")
    df.select(col(idCol), fmtCol.as("feed_format"), posexplode(
        when(fmtCol === "rss", regexp_extract_all(xml,
          lit("<item>([\\s\\S]*?)</item>"), lit(1)))
          .when(fmtCol === "atom", regexp_extract_all(xml,
            lit("<entry>([\\s\\S]*?)</entry>"), lit(1)))
          .otherwise(array().cast("array<string>")))
        .as(Seq("item_idx", "b")))
      .select(col(idCol), col("feed_format"),
        col("item_idx").cast("long").as("item_idx"),
        nullif(regexp_extract(b, "<title>([^<]*)</title>", 1), lit(""))
          .as("title"),
        coalesce(
          nullif(regexp_extract(b, "<link>([^<]*)</link>", 1), lit("")),
          nullif(regexp_extract(b,
            "(?i)<link\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\"", 1),
            lit(""))).as("url"),
        {
          // Spark (Java time) forbids `E` in PARSE patterns, so the
          // optional RFC-822 day-of-week prefix is stripped by regex
          // first; the two residual shapes (zone name vs numeric
          // offset) then coalesce. `Z` parses `+0000`-style offsets to
          // the true instant (session tz is UTC throughout graft).
          val rfc822 = regexp_replace(
            nullif(trim(regexp_extract(b,
              "<pubDate>([^<]*)</pubDate>", 1)), lit("")),
            lit("^[A-Za-z]{3},\\s*"), lit(""))
          coalesce(
            try_to_timestamp(rfc822, lit("d MMM yyyy HH:mm:ss 'GMT'")),
            try_to_timestamp(rfc822, lit("d MMM yyyy HH:mm:ss Z")),
            try_to_timestamp(nullif(regexp_extract(b,
              "<updated>([^<]*)</updated>", 1), lit("")),
              lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))).as("pub_ts")
        })
  }
}
