package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.pipeline.{Extract, Turn, TurnResult}

/** Streaming ingestion variant of the extraction pipeline.
  *
  * The reference is a work-queue BATCH system (SURVEY §2.10) and the primary
  * engine is batch + checkpoint-resume (SURVEY §7.3). This module exists for
  * deployments where transcripts LAND continuously (e.g. a drop directory /
  * Iceberg streaming source): the same per-turn transform runs under
  * Structured Streaming with exactly-once file-sink semantics, giving the
  * queue behavior (Q1-Q5) for free — per-microbatch task retries, offsets in
  * the checkpoint, resumable after restart.
  *
  * No watermarks/event-time windows: `ts` is data, not event-time control
  * (SURVEY §2.10), and the transform is stateless per row.
  */
object ExtractStream {

  val TranscriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** File-source stream over a directory where transcript parquet files
    * land. `maxFilesPerTrigger` bounds micro-batch size (scale lever: keeps
    * per-batch memory flat regardless of backlog).
    */
  def readTranscriptStream(spark: SparkSession, dir: String,
                           maxFilesPerTrigger: Int = 16): Dataset[Turn] = {
    import spark.implicits._
    spark.readStream
      .schema(TranscriptSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .select("conv_id", "turn_idx", "role", "text", "tool")
      .as[Turn]
  }

  /** The same object-stage transform as the batch path — one code path for
    * both execution modes.
    */
  def extractStream(turns: Dataset[Turn]): Dataset[TurnResult] =
    Extract.extract(turns)

  /** Parquet sink with checkpointed exactly-once file commits. Caller
    * `.start()`s and awaits.
    */
  def writer(results: Dataset[TurnResult], outDir: String,
             checkpointDir: String): DataStreamWriter[TurnResult] =
    results.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()) // drain backlog then stop; continuous
                                       // deployments use ProcessingTime

  // ------------------------------------------------------- event-time ops

  /** Streaming corpus metrics (the A2 report as a live dashboard feed):
    * tumbling event-time windows over `ts` with a watermark bounding state.
    * Late rows beyond the watermark are dropped by the engine; window state
    * is purged once the watermark passes — memory stays flat at any volume.
    */
  def windowedReport(turnsWithTs: DataFrame,
                     windowLen: String = "1 minute",
                     lateness: String = "2 minutes"): DataFrame =
    turnsWithTs
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("turns"),
        sum(when(col("filtered"), 1L).otherwise(0L)).as("filtered_turns"),
        sum(length(coalesce(col("md"), lit("")))).as("md_chars"))
      .select(col("window.start").as("window_start"),
        col("turns"), col("filtered_turns"), col("md_chars"))

  /** One finalized conversation document. */
  final case class ConvDoc(conv_id: String, doc_md: String, n_pages: Int)

  /** Accumulating per-conversation session state (encoder-visible). */
  final case class ConvState(turns: List[(Int, String)])

  /** Streaming conversation fan-in (the docFanIn analog for continuously
    * landing transcripts): per-conversation state accumulates (turn_idx, md)
    * and the finished document is emitted when the EVENT-TIME watermark
    * passes `gapMs` beyond the conversation's last turn — classic
    * sessionization via flatMapGroupsWithState + EventTimeTimeout. State is
    * dropped on emit, so memory is bounded by conversations inside one gap
    * window, not the corpus.
    */
  def sessionFanIn(rows: Dataset[(String, Int, String, java.sql.Timestamp)],
                   gapMs: Long = 60000L): Dataset[ConvDoc] = {
    import rows.sparkSession.implicits._
    rows.toDF("conv_id", "turn_idx", "md", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(String, Int, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (convId: String, it: Iterator[(String, Int, String, java.sql.Timestamp)],
         state: GroupState[ConvState]) => {
          if (state.hasTimedOut) {
            val turns = state.get.turns.sortBy(t => (t._1, t._2))
            state.remove()
            Iterator.single(ConvDoc(convId,
              turns.map(_._2).mkString("\n\n---\n\n"), turns.length))
          } else {
            var maxTs = 0L
            var acc = state.getOption.map(_.turns).getOrElse(Nil)
            it.foreach { r =>
              acc = (r._2, r._3) :: acc
              maxTs = math.max(maxTs, r._4.getTime)
            }
            state.update(ConvState(acc))
            // fire once no event-time progress happens for gapMs
            state.setTimeoutTimestamp(maxTs + gapMs)
            Iterator.empty
          }
        })
  }
}
