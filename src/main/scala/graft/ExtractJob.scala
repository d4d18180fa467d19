package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Extract

/** Production entrypoint (north star: "runs via spark-submit on
  * multi-executor clusters").
  *
  *   spark-submit --class graft.ExtractJob app.jar <transcriptsPath> <outDir>
  *
  * Master/executor topology comes from spark-submit; a local default is
  * provided so the job also runs standalone. The run is checkpointed:
  * re-submitting after a failure processes only the missing keys
  * (Extract.runCheckpointed), and per-partition lineage + observed corpus
  * metrics land next to the results.
  */
object ExtractJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExtractJob <transcriptsPath> <outDir>")
    val Array(in, out) = args.take(2)
    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; default only when absent
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty)
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = Extract.runCheckpointed(spark, in, out)
    println(s"[graft.ExtractJob] increment metrics: $metrics")
    spark.stop()
  }
}
