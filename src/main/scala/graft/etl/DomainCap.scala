package graft.etl

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain contribution capping — the head-domain balance step of
  * published web-corpus recipes (C4's per-source limits, Raffel 2020;
  * the per-domain repetition analyses of Penedo 2023): no single
  * registrable domain may contribute more than `capBp`/10000 of the
  * corpus' total weight (tokens), because crawl frontiers are Zipfian
  * and an uncapped head domain (a forum mirror, a tag-page factory)
  * silently becomes double-digit percent of the training mix. Where
  * [[UniMax]] allocates BUDGETS per language, this selects DOCUMENTS
  * per domain: within an over-cap domain, docs are kept in
  * deterministic hash order (F.murmur64 — the q41 sampling key, so the
  * keep-set is engine-portable and stable across runs; DuckDB's
  * `hash(BIGINT)` is the same finalizer) until the domain's running
  * total would exceed the cap — or, via [[capByQuality]], in
  * quality-score order so the cap keeps a head domain's BEST pages and
  * the hash only breaks ties. A single document heavier than the whole
  * cap is dropped — the cap is a hard ceiling, not a target.
  *
  * Scale shape: one shuffle by domain (the window partition key); the
  * corpus total rides a one-row broadcast crossJoin (the UniMax
  * precedent). There is NO global sort — the window orders within one
  * domain's rows only, so a skewed head domain costs that domain's own
  * row count, never the corpus'. At 100 TB the domain dim is ~10⁷ hosts
  * against ~10¹⁰ docs: the per-domain sort is the cheapest shape that
  * gives a deterministic keep-set (a sortless alternative — keep iff
  * bucket(id) < cap/total — can't hit the cap EXACTLY per domain, which
  * is the operator's contract).
  */
object DomainCap {

  /** Cap each domain at `capBp`/10000 of total `weightCol`. Output:
    * idCol, domainCol, weightCol, kept — `kept` is true while the
    * domain's hash-ordered running weight stays within the cap.
    */
  def cap(df: DataFrame, idCol: String, domainCol: String,
      weightCol: String, capBp: Int): DataFrame =
    capOrdered(df, idCol, domainCol, weightCol, capBp, Nil, Nil)

  /** [[cap]] ordered by QUALITY: within an over-cap domain the
    * highest-`qualityCol` documents are kept first (the hash order only
    * breaks quality ties), so the cap discards a head domain's WORST
    * pages instead of a hash-random prefix — the selection a corpus
    * actually wants once a quality signal exists (q25/q115-style
    * scores). Same single domain-keyed shuffle and running-sum window
    * as [[cap]]; ordering within a partition is free once the rows are
    * co-located. Output adds `qualityCol` between the weight and the
    * verdict.
    */
  def capByQuality(df: DataFrame, idCol: String, domainCol: String,
      weightCol: String, qualityCol: String, capBp: Int): DataFrame =
    capOrdered(df, idCol, domainCol, weightCol, capBp,
      Seq(col(qualityCol).desc), Seq(col(qualityCol)))

  private def capOrdered(df: DataFrame, idCol: String, domainCol: String,
      weightCol: String, capBp: Int,
      orderPrefix: Seq[org.apache.spark.sql.Column],
      extraOut: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(capBp > 0 && capBp <= 10000,
      s"capBp must be in (0, 10000], got $capBp")
    val total = df.agg(sum(col(weightCol)).cast("long").as("w_total"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(orderPrefix ++
        Seq(shiftrightunsigned(F.murmur64(col(idCol)), 1).asc,
          col(idCol).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.crossJoin(broadcast(total))
      .withColumn("w_cum", sum(col(weightCol)).over(w))
      .select((Seq(col(idCol), col(domainCol), col(weightCol)) ++
        extraOut :+
        // integer cross-multiply: w_cum/total <= capBp/10000 without
        // a float share for engines to disagree on
        (col("w_cum") * 10000L <= col("w_total") * capBp.toLong)
          .as("kept")): _*)
  }
}
