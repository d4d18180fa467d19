package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of persisted intermediate DataFrames created inside ops.
  *
  * Ops like [[VectorOps.annLsh]] or [[DocOps.lshCandidates]] persist small
  * derived tables (band/code tables, the projected embedding base) because
  * differently-aliased self-join branches defeat ReusedExchange and would
  * recompute the whole signature pipeline per branch. The returned query
  * plans are lazy, so the op itself cannot unpersist — the caller owns the
  * terminal action. Long-lived sessions (the bench loop, a notebook) call
  * [[release]] after materializing a result to drop the cached blocks;
  * without it, MEMORY_AND_DISK spill blocks accumulate in the block manager
  * until the SparkContext stops.
  */
object CacheLedger {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private[ops] def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Number of currently-tracked (not yet released) intermediates. */
  def trackedCount: Int = tracked.size()

  /** Unpersist every tracked intermediate (non-blocking). Safe to call at
    * any time: Spark recomputes dropped blocks if a plan still needs them,
    * so releasing "too early" costs recompute, never correctness.
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }
}
