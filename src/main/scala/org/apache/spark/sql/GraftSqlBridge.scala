package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters. Spark 4
  * routes Column construction through ColumnNodes; this is the classic
  * (non-Connect) conversion path, exposed for graft's native expressions.
  * The same pattern every Catalyst-extension library uses.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Release the block-manager storage behind a `localCheckpoint(true)`d
    * frame: walk the analyzed plan for its [[execution.LogicalRDD]]
    * leaves and unpersist their RDDs (non-blocking). An eager local
    * checkpoint truncates lineage, so its blocks are NOT recoverable —
    * callers must only release a frame once every consumer that reads
    * it has already materialized (graft's iterative builders: each
    * prefix-doubling / Lloyd round is itself eagerly checkpointed
    * before the previous round's table is released). Without this, a
    * log-round builder pins one corpus-sized frame per round for the
    * session's lifetime — the r18 q176 10× OOM.
    */
  def unpersistCheckpoints(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
