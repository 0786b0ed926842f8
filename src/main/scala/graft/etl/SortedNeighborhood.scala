package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood entity-resolution blocking (Hernández/Stolfo 1995,
  * public) — the OTHER classic blocking scheme beside q48's q-gram
  * blocking: sort records by a key and compare each record only to its
  * `w−1` successors in sort order. Right when the key sorts
  * near-duplicates adjacently (names, addresses, normalized codes);
  * q-gram blocking wins when typos hit the sort prefix.
  *
  * Distributed form: the window partitions by a caller-chosen coarse
  * `blockCol` (a key prefix / category), because a global ORDER BY
  * window is a single-partition scale killer (the q64 lesson). The
  * boundary contract is the standard blocked-ER one — records whose
  * block values differ are never compared — so choose the block exactly
  * like the multi-pass literature does: coarse enough to sort true
  * matches together, fine enough to bound a partition (run a second
  * pass with a different block/key to catch boundary escapees).
  *
  * Scale shape: one block-keyed sort exchange, then `w−1` lead()
  * columns over the SAME window — Catalyst stacks them on a single
  * sort, so candidate generation adds ZERO joins and the candidate
  * count is exactly n·(w−1), linear whatever the key distribution
  * (contrast: a skewed q-gram block explodes quadratically). The exact
  * Levenshtein verify runs in the projection on candidate rows only.
  * Ordering ties break by id, so pairs are engine-reproducible and the
  * q91 oracle replays the identical window in SQL.
  */
object SortedNeighborhood {

  /** Candidate pairs within a window of `w` in (key, id) sort order
    * inside each block, verified by `levenshtein ≤ maxDist` on
    * `nameCol`. Output: (id_a, id_b, dist) with id_a the sort-order
    * predecessor.
    */
  def pairs(df: DataFrame, idCol: Column, blockCol: Column, keyCol: Column,
      nameCol: Column, w: Int, maxDist: Int): DataFrame = {
    require(w >= 2, "window must span at least one neighbor")
    val win = Window.partitionBy(blockCol).orderBy(keyCol, idCol)
    val neighbors = (1 until w).map(j =>
      struct(lead(idCol, j).over(win).as("id_b"),
        lead(nameCol, j).over(win).as("name_b")))
    df.select(idCol.as("id_a"), nameCol.as("name_a"),
        array(neighbors: _*).as("nbs"))
      .select(col("id_a"), col("name_a"), explode(col("nbs")).as("nb"))
      .where(col("nb.id_b").isNotNull)
      .select(col("id_a"), col("nb.id_b").as("id_b"),
        levenshtein(col("name_a"), col("nb.name_b")).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
