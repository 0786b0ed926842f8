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
}
