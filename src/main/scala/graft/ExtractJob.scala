package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.Extract

/** Production entrypoint (north star: "runs via spark-submit on
  * multi-executor clusters").
  *
  *   spark-submit --class graft.ExtractJob app.jar <transcriptsPath> <outDir>
  *   spark-submit --class graft.ExtractJob app.jar extract <transcripts> <outDir>
  *   spark-submit --class graft.ExtractJob app.jar reparse <transcripts> <outDir>
  *   spark-submit --class graft.ExtractJob app.jar compact <outDir>
  *   spark-submit --class graft.ExtractJob app.jar expire  <outDir> [retainLast]
  *
  * The bare two-arg form stays the extract default (round-1 contract).
  * Master/executor topology comes from spark-submit; a local default is
  * provided so the job also runs standalone. Extract runs are
  * checkpointed: re-submitting after a failure processes only the missing
  * keys (Extract.runCheckpointed), and per-partition lineage + observed
  * corpus metrics land next to the results. `reparse` re-extracts only
  * error rows (file-granular rewrite through the snapshot protocol),
  * `compact` rewrites the table to its canonical layout, `expire` applies
  * snapshot retention (Iceberg expire_snapshots analog).
  */
object ExtractJob {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: ExtractJob [extract|reparse] <transcriptsPath> <outDir> | " +
        "compact <outDir> | expire <outDir> [retainLast]")
    val builder = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; default only when absent
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty)
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args(0) match {
      case "compact" =>
        require(args.length >= 2, "usage: ExtractJob compact <outDir>")
        Extract.compactResults(spark, args(1))
        println(s"[graft.ExtractJob] compacted ${args(1)}")
      case "expire" =>
        require(args.length >= 2, "usage: ExtractJob expire <outDir> [retainLast]")
        val retain = if (args.length >= 3) args(2).toInt else 2
        val expired = Extract.expireResultSnapshots(spark, args(1), retain)
        println(s"[graft.ExtractJob] expired snapshots: " +
          (if (expired.isEmpty) "none" else expired.mkString(", ")))
      case "reparse" =>
        require(args.length >= 3, "usage: ExtractJob reparse <transcripts> <outDir>")
        val metrics = Extract.reparseErrors(spark, args(1), args(2))
        println(s"[graft.ExtractJob] reparse metrics: $metrics")
      case "extract" =>
        require(args.length >= 3, "usage: ExtractJob extract <transcripts> <outDir>")
        val metrics = Extract.runCheckpointed(spark, args(1), args(2))
        println(s"[graft.ExtractJob] increment metrics: $metrics")
      case in => // bare two-arg form: <transcriptsPath> <outDir>
        require(args.length >= 2,
          "usage: ExtractJob <transcriptsPath> <outDir>")
        val metrics = Extract.runCheckpointed(spark, in, args(1))
        println(s"[graft.ExtractJob] increment metrics: $metrics")
    } finally spark.stop()
  }
}
