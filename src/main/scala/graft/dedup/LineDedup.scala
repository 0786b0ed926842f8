package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level LINE deduplication (CCNet/RefinedWeb-style boilerplate
  * removal): a line that occurs in many distinct documents is template
  * chrome (navigation, footers, cookie banners), not content — drop every
  * occurrence corpus-wide and reassemble the documents.
  *
  * This is the line-granularity sibling of the q16 document-level exact
  * dedup: q16 drops whole duplicate documents; this keeps every document
  * but strips the lines shared by ≥ `minDocs` of them.
  *
  * Scale shape: lines explode map-side with their position; the duplicate
  * count shuffles (xxhash64(line), length(line)) — a 12-byte key, never the
  * line text (the q16 lesson) — with a map-side-combined distinct-doc
  * count. The duplicate-line set (boilerplate) is then LEFT-joined back on
  * the same narrow key to flag occurrences, and documents reassemble with
  * one doc_id-keyed aggregation whose collect_list is made deterministic by
  * array_sort on the (pos, line) struct. Two narrow-key shuffles total;
  * hash+length collisions are the only approximation (≈ 2⁻⁶⁴·pairs — the
  * same accepted risk as q16, documented there).
  */
object LineDedup {

  /** Strip lines occurring in ≥ `minDocs` distinct docs.
    * Output: (doc_id, n_lines, n_removed, kept_text).
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long): DataFrame = {
    val lines = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("_h", xxhash64(col("line")))
      .withColumn("_len", length(col("line")))

    // distinct-doc count per line identity; only the boilerplate survives
    val boiler = lines
      .select("_h", "_len", "doc_id").distinct()
      .groupBy("_h", "_len").agg(count(lit(1)).as("_ndocs"))
      .where(col("_ndocs") >= minDocs)
      .select(col("_h"), col("_len"), lit(true).as("_dup"))

    lines
      .join(boiler, Seq("_h", "_len"), "left")
      .withColumn("_dup", coalesce(col("_dup"), lit(false)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_removed"),
        concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(!col("_dup"), struct(col("pos"), col("line"))))),
            x => x.getField("line"))).as("kept_text"))
      .select("doc_id", "n_lines", "n_removed", "kept_text")
  }

  /** RefinedWeb-style duplicated-content page signal (Penedo et al. 2023
    * §3.3's "fraction of duplicated content"): the fraction of a page's
    * characters that live in paragraphs occurring in ≥ `minDocs` distinct
    * documents, plus a keep verdict at `maxDupBp` basis points. Unlike
    * [[stripBoilerplate]] (which rewrites the text), this SCORES pages for
    * a filter decision — the page-level use of the same evidence.
    *
    * Same scale shape as [[stripBoilerplate]]: the duplicate census
    * shuffles (xxhash64(paragraph), length) — never the text — and joins
    * back on the same narrow key; one doc-keyed aggregation ends it.
    * Output: (doc_id, n_paras, n_dup_paras, total_chars, dup_chars,
    * dup_bp, keep).
    */
  def dupParagraphStats(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Long = 2L, maxDupBp: Long = 3000L): DataFrame = {
    val paras = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n{2,}")).as("para"))
      .withColumn("_h", xxhash64(col("para")))
      .withColumn("_len", length(col("para")))
    val dup = paras
      .select("_h", "_len", "doc_id").distinct()
      .groupBy("_h", "_len").agg(count(lit(1)).as("_ndocs"))
      .where(col("_ndocs") >= minDocs)
      .select(col("_h"), col("_len"), lit(true).as("_dup"))
    paras
      .join(dup, Seq("_h", "_len"), "left")
      .withColumn("_dup", coalesce(col("_dup"), lit(false)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("_dup"), 1L).otherwise(0L)).as("n_dup_paras"),
        sum(col("_len").cast("long")).as("total_chars"),
        sum(when(col("_dup"), col("_len").cast("long")).otherwise(0L))
          .as("dup_chars"))
      .withColumn("dup_bp",
        when(col("total_chars") > 0,
          floor(col("dup_chars") * 10000L /
            col("total_chars").cast("double")).cast("long"))
          .otherwise(0L))
      .withColumn("keep", col("dup_bp") <= maxDupBp)
  }
}
