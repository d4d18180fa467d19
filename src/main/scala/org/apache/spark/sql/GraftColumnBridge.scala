package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor / Column.expr;
  * the classic bridge (org.apache.spark.sql.classic.ExpressionUtils) is
  * private[sql]. This shim re-exports the two conversions for graft's
  * custom Catalyst expressions. No Spark behavior is modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager localCheckpoint that ALSO truncates statistics.
    *
    * `Dataset.localCheckpoint` truncates the logical plan to a `LogicalRDD`
    * leaf but carries the checkpointed plan's stats along as
    * `originalStats`. In an iterative fixpoint (connected components,
    * label propagation) each round's joins MULTIPLY the leaf's
    * `sizeInBytes`, so the estimate's bit-length doubles every round —
    * after ~20 rounds Catalyst's size arithmetic is Karatsuba-multiplying
    * million-bit BigIntegers and a sub-second round takes minutes
    * (measured: 0.3 s → 80 s by round 23 on a 500-node path graph). This
    * helper rebuilds the leaf without `originalStats`, so every round
    * re-plans from the neutral default estimate. Only the stats metadata
    * is dropped; the checkpointed RDD, partitioning and ordering are
    * reused as-is.
    */
  def localCheckpointStatsFresh(df: Dataset[Row]): Dataset[Row] =
    statsFresh(df.localCheckpoint(true))

  /** LAZY variant of [[localCheckpointStatsFresh]] (round 8): the plan is
    * truncated to a LogicalRDD leaf immediately, but materialization is
    * deferred to the caller's NEXT action — so a fixpoint loop can fold
    * the round's materialization into the convergence-check aggregate
    * (one job per round instead of checkpoint-job + check-job). Safe for
    * plans referenced more than once before that action: the leaf wraps
    * ONE RDD, so its shuffle dependencies are scheduled once per shuffle
    * id, and the local-checkpoint persist caches the final partitions.
    */
  def localCheckpointStatsFreshLazy(df: Dataset[Row]): Dataset[Row] =
    statsFresh(df.localCheckpoint(false))

  private def statsFresh(ck: Dataset[Row]): Dataset[Row] =
    ck.queryExecution.analyzed match {
      case lr: execution.LogicalRDD =>
        val session = ck.sparkSession.asInstanceOf[classic.SparkSession]
        val clean = execution.LogicalRDD(lr.output, lr.rdd,
          lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
          lr.stream)(session, None, None)
        classic.Dataset.ofRows(session, clean)
      case _ => ck // unexpected shape: fall back to the plain checkpoint
    }
}
