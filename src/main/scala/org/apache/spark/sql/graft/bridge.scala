package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4.x moved
  * `Column` onto ColumnNode; classic-mode expression wrapping lives in
  * org.apache.spark.sql.classic.ExpressionUtils). Standard extension-library
  * pattern: a tiny shim inside the org.apache.spark.sql package tree.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session's FunctionRegistry (the
    * runtime counterpart of `SparkSessionExtensions.injectFunction`, which
    * only applies at session build). Used by `graft.functions.GraftFunctions
    * .register` so notebooks/tests can enable the SQL surface on an
    * existing session.
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)

  /** Drop the block-manager storage behind a `localCheckpoint(true)`-ed
    * frame. `Dataset.unpersist` only clears CacheManager entries; a local
    * checkpoint persists its RDD directly (LocalRDDCheckpointData), so an
    * iterative loop that keeps only the LAST round's frame accumulates one
    * superseded frame's blocks per round until GC/ContextCleaner runs —
    * at cluster scale that is rounds × frontier-size of dead executor
    * memory. Call this on a round's frame ONLY once the next round has
    * materialized and the frame will never be read again: the checkpoint
    * IS the data (lineage was truncated), so unpersisting it makes the
    * frame unrecomputable. No-op for frames that are not local
    * checkpoints.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
