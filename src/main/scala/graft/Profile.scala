package graft
import org.apache.spark.sql.functions._
import graft.pipeline.Extract

object Profile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rep = args(1).toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (64 << 10).toString)
      .config("spark.sql.files.openCostInBytes", (16 << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def turns = {
      val t0 = Extract.readTranscripts(spark, "/root/repo/data/transcripts_bench")
      t0.toDF()
        .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
        .withColumn("conv_id", concat(col("conv_id"), lit("#"), col("rep")))
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .as[graft.pipeline.Turn]
    }
    def t(name: String)(f: => Any): Unit = {
      val gcb = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      var gc0 = 0L; gcb.forEach(b => gc0 += b.getCollectionTime)
      val t0 = System.nanoTime(); f
      var gc1 = 0L; gcb.forEach(b => gc1 += b.getCollectionTime)
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s  gc=${(gc1-gc0)/1000.0}%.2f s")
    }
    // warmup
    turns.limit(50000).mapPartitions(_.map(graft.pipeline.ExtractTurn.apply)).toDF().count()
    t("scan_explode_count")(turns.toDF().agg(sum(length(col("text")))).collect())
    t("scan_explode_count2")(turns.toDF().agg(sum(length(col("text")))).collect())
    t("extract_full")(Extract.extract(turns).toDF().agg(count(lit(1)), sum(length(coalesce(col("md"), lit(""))))).collect())
    t("extract_full2")(Extract.extract(turns).toDF().agg(count(lit(1)), sum(length(coalesce(col("md"), lit(""))))).collect())
    // object stage but discard results without encoder serialization:
    t("extract_noencode")(turns.mapPartitions { it =>
      var n = 0L
      it.foreach { tu => val r = graft.pipeline.ExtractTurn(tu); n += r.md.map(_.length).getOrElse(0).toLong }
      Iterator.single(n)
    }.reduce(_ + _))
    spark.stop()
  }
}
