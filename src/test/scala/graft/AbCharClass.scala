package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B of the char-class count formulations over the
  * sf0.1 documents table: the regex idiom (4 regexp_replace passes) vs the
  * one-pass CharClassCounts kernel. `Test/runMain graft.AbCharClass`.
  */
object AbCharClass {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // args(0) = text replication factor: sf0.1 docs average ~300 chars;
    // real web documents are KBs, where the per-row formulation dominates
    val rep = if (args.nonEmpty) args(0).toInt else 1
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", (0 until rep).map(_ => col("text")): _*).as("text"))
      .localCheckpoint(true)

    def cnt(re: String) =
      (length(col("text")) - length(regexp_replace(col("text"), re, ""))).cast("long")
    // FRESH Dataset per measurement: a Dataset memoizes toRdd, so a second
    // collect() on the same instance reuses the shuffle files and SKIPS
    // the map stage where the per-row work runs (first harness version
    // measured that skip as a 4 GB/s regex)
    def regexDf = docs.select(
      cnt("[A-Za-z]").as("a"), cnt("[\\u4E00-\\u9FFF]").as("b"),
      cnt("[\\u0400-\\u04FF]").as("c"), cnt("[\\u0600-\\u06FF]").as("d"))
      .agg(sum("a"), sum("b"), sum("c"), sum("d"))
    def kernelDf = {
      val cc = graft.functions.CharClassCounts
        .char_class_counts(col("text"), graft.ops.DocOps.ScriptClasses)
      docs.withColumn("__cc", cc).select(
        col("__cc").getItem(0).as("a"), col("__cc").getItem(1).as("b"),
        col("__cc").getItem(2).as("c"), col("__cc").getItem(3).as("d"))
        .agg(sum("a"), sum("b"), sum("c"), sum("d"))
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    println("AB_debug rows=" + docs.count() + " avgLen=" +
      docs.agg(avg(length(col("text")))).collect()(0).getDouble(0))
    // warmup both (JIT + codegen compile), then interleave; min per mode
    println("AB_warm regex " + time(regexDf.collect()) + " kernel " + time(kernelDf.collect()))
    var tr = Double.MaxValue; var tk = Double.MaxValue
    for (i <- 1 to 3) {
      val a = time(regexDf.collect()); val b = time(kernelDf.collect())
      println(f"AB_iter$i regex $a%.1f kernel $b%.1f")
      tr = math.min(tr, a)
      tk = math.min(tk, b)
    }
    assert(regexDf.collect().toSeq.toString == kernelDf.collect().toSeq.toString)
    println(f"AB_charclass regex $tr%.1f ms  kernel $tk%.1f ms  speedup ${tr / tk}%.2fx")
    spark.stop()
  }
}
