package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ExtractStream

/** Drives the streaming variant end-to-end over a landing directory and
  * checks (a) results equal the batch path, (b) restart-with-checkpoint
  * does not reprocess (exactly-once file semantics = Q5 resume).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("streaming-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming extraction equals batch extraction; checkpoint resume skips done work") {
    val work = Files.createTempDirectory("graft-stream").toFile.getAbsolutePath
    val landing = s"$work/landing"
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"

    // land the t1 corpus as a file-source input
    spark.read.parquet("data/transcripts_t1").coalesce(2)
      .write.parquet(landing)

    val q1 = ExtractStream.writer(
      ExtractStream.extractStream(ExtractStream.readTranscriptStream(spark, landing)),
      out, ckpt).start()
    q1.awaitTermination()

    val streamed = spark.read.parquet(out)
    val batch = graft.pipeline.Extract.run(spark, "data/transcripts_t1").toDF()
    assert(streamed.count() === batch.count())
    val diff = streamed.select("conv_id", "turn_idx", "cells_json", "md", "md_nohf", "filtered")
      .exceptAll(batch.select("conv_id", "turn_idx", "cells_json", "md", "md_nohf", "filtered"))
      .count()
    assert(diff === 0L)

    // restart with same checkpoint: no new input -> no new rows
    val q2 = ExtractStream.writer(
      ExtractStream.extractStream(ExtractStream.readTranscriptStream(spark, landing)),
      out, ckpt).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() === batch.count())
  }
}
