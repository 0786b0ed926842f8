package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC changelog application — the MERGE INTO / upsert-apply analog of the
  * reference's append-only warehouse load (helpers.py:656-741 only appends;
  * a real warehouse also consumes ordered insert/update/delete streams).
  *
  * Semantics: the changelog carries (key, seq, op ∈ {I,U,D}, payload);
  * within a key the row with the highest `seq` wins, and a winning D drops
  * the key. Snapshot rows participate with seq = Long.MinValue, so any
  * change outranks them.
  *
  * Scale shape: ONE shuffle on the key — the union is map-side, the winner
  * is a `max_by(struct(...), seq)` aggregation (map-side partial combine,
  * no window sort, no self-join). Contract: `seq` is strictly increasing
  * per key (CDC sources emit LSNs/offsets); equal seqs would tie-break
  * nondeterministically, which is the source's bug, not the consumer's.
  */
object CdcMerge {

  def apply(snapshot: DataFrame, changelog: DataFrame, keyCol: String,
      seqCol: String, opCol: String, payloadCols: Seq[String]): DataFrame = {
    val snap = snapshot.select(
      col(keyCol) +: lit(Long.MinValue).as(seqCol) +: lit("S").as(opCol) +:
        payloadCols.map(col): _*)
    val chg = changelog.select(
      col(keyCol) +: col(seqCol).cast("long") +: col(opCol) +:
        payloadCols.map(col): _*)
    snap.unionByName(chg)
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(col(opCol).as("op") +: payloadCols.map(col): _*),
        col(seqCol)).as("w"))
      .where(col("w.op") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c => col(s"w.$c").as(c)): _*)
  }
}
