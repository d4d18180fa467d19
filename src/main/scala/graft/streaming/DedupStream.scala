package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DocOps

/** Continuous near-duplicate detection over a document stream — the
  * streaming face of round 7's incremental-append dedup: each micro-batch
  * fingerprints ONLY its own documents, probes the persisted rep-level
  * SimHash band index for collisions (verification is bit_count(xor) on
  * fingerprints already stored in the index — the historical corpus is
  * never re-read), and maintains the keeper-label table via the
  * contracted-graph CC fixpoint ([[DocOps.keepersFromEdgesIncremental]]).
  *
  * State layout under `stateDir` (plain parquet, versioned by batch id):
  * {{{
  *   index_v<batchId>/    rep-level band rows (doc_id, simhash, chunk_idx, chunk_val)
  *   labels_v<batchId>/   keeper table (doc_id, keeper_doc_id) for ALL docs so far
  * }}}
  *
  * Replay safety (foreachBatch may re-deliver a batch after a crash):
  * state for batch B is READ from the highest version strictly below B and
  * WRITTEN (mode=overwrite) as version B — a replayed batch recomputes
  * from the same inputs and overwrites the same outputs, so the state
  * after "crash between write and offset-commit, then replay" is
  * byte-identical to the clean run (spec-asserted). Versions are never
  * mutated in place, so a reader never observes a half-written table.
  *
  * 100-TB shape: per-batch cost is O(batch + collisions) — batch-only
  * fingerprints (one partial agg), an equi-join against the index
  * (doc-count-proportional: maxDist+1 longs per distinct fingerprint), and
  * a CC fixpoint over the CONTRACTED graph (≤ batch-incident edges). The
  * label/index rewrite per batch is the parquet-state simplification; a
  * production deployment appends the index delta and upserts labels
  * through the snapshot store instead of rewriting.
  */
object DedupStream {

  private def latestVersion(spark: SparkSession, stateDir: String,
                            prefix: String, below: Long): Option[Long] = {
    val dir = new Path(stateDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    val vs = fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
      .filter(_ < below).toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Next batch id for DIRECT (non-streaming) appends against the state —
    * Structured Streaming supplies monotone ids itself; a batch caller
    * (e.g. [[graft.DocJob]] `dedup`) asks the state instead.
    */
  def nextBatchId(spark: SparkSession, stateDir: String): Long =
    latestVersion(spark, stateDir, "labels_v", Long.MaxValue)
      .map(_ + 1L).getOrElse(0L)

  /** Process one micro-batch of documents(doc_id, text, …) against the
    * state under `stateDir`, writing `index_v<batchId>` and
    * `labels_v<batchId>`. Exposed for direct (non-streaming) use and for
    * replay-idempotence testing.
    */
  def processBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
                   batchId: Long, maxDist: Int = 3): Unit = {
    val idxOut = s"$stateDir/index_v$batchId"
    val labOut = s"$stateDir/labels_v$batchId"
    latestVersion(spark, stateDir, "labels_v", batchId) match {
      case None =>
        val b = batch.localCheckpoint(true)
        DocOps.keepersFromEdges(b, DocOps.simhashEdges(b, maxDist))
          .write.mode("overwrite").parquet(labOut)
        DocOps.simhashIndex(b, maxDist).write.mode("overwrite").parquet(idxOut)
      case Some(prev) =>
        val oldIdx = spark.read.parquet(s"$stateDir/index_v$prev")
        val labels0 = spark.read.parquet(s"$stateDir/labels_v$prev")
        val b = batch.localCheckpoint(true)
        val (edges, newIdx) = DocOps.simhashEdgesAppend(oldIdx, b, maxDist)
        val allDocs = labels0.select(col("doc_id"))
          .union(b.select(col("doc_id")))
        DocOps.keepersFromEdgesIncremental(allDocs, labels0, edges)
          .write.mode("overwrite").parquet(labOut)
        // the new index = old rows ∪ the batch's rep band rows; reps are
        // per-batch minima, so cross-batch fingerprint collisions keep one
        // rep per (batch, fingerprint) — harmless for correctness (their
        // hamming-0 pair is already an edge) and bounded by batch count
        oldIdx.union(newIdx).write.mode("overwrite").parquet(idxOut)
    }
  }

  /** foreachBatch sink maintaining the dedup state. Attach with
    * `docsStream.writeStream.foreachBatch(DedupStream.sink(dir))`.
    */
  def sink(stateDir: String, maxDist: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch.sparkSession, stateDir, batch, batchId, maxDist)
}
