package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
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
}
