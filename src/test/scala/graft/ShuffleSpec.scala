package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Extract

/** Plan-level evidence for the scale levers: salted repartition bounds
  * conversation skew; bucketing co-locates joins (no Exchange).
  */
class ShuffleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toFile.getAbsolutePath
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("shuffle-spec")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted repartition spreads a skewed conversation across partitions") {
    // t2 plants one 800-turn conversation; plain repartition(8, conv_id)
    // would put all 800 rows in ONE partition
    val turns = Extract.readTranscripts(spark, "data/transcripts_t2").toDF()
    val big = turns.where(col("conv_id") === "t2-conv-00000") // the 800-turn conv
    assert(big.count() === 800L)

    val keyed = big.repartition(8, col("conv_id"))
      .select(spark_partition_id().as("p")).groupBy("p").count().collect()
    assert(keyed.length === 1, "hash-by-conv_id concentrates the conversation")

    val salted = Extract.saltedRepartition(big, parts = 8, bucket = 64)
      .select(spark_partition_id().as("p")).groupBy("p").count().collect()
    assert(salted.length >= 4,
      s"salted repartition should spread 800 turns over >=4 of 8 partitions, got ${salted.length}")
    assert(salted.map(_.getLong(1)).max <= 400L,
      "no partition should hold more than half the conversation")
  }

  test("docFanIn streams per-group concat: no collect_list buffer, giant conv ok") {
    val s = spark
    import s.implicits._
    // one 60k-turn conversation plus small ones: the old collect_list form
    // materialized the whole group as ONE aggregation-buffer array
    val giant = (0 until 60000).map(i => ("conv-giant", i, s"turn $i md"))
    val small = (0 until 5).flatMap(c => (0 until 3).map(i => (s"conv-$c", i, s"c$c t$i")))
    val df = (giant ++ small).toDF("conv_id", "turn_idx", "md")
      .repartition(8) // scrambled input order
    val out = Extract.docFanIn(df)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"fan-in must not buffer groups via collect_list:\n${plan.take(1500)}")
    val byConv = out.collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byConv("conv-giant")._2 === 60000L)
    val gmd = byConv("conv-giant")._1
    assert(gmd.startsWith("turn 0 md\n\n---\n\nturn 1 md"))
    assert(gmd.endsWith("turn 59999 md"))
    assert(byConv("conv-2") === (("c2 t0\n\n---\n\nc2 t1\n\n---\n\nc2 t2", 3L)))
    assert(byConv.size === 6)
  }

  test("bucketed tables join without an Exchange (co-located join)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val j = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(j.count() > 0)

    // contrast: the same join on unbucketed parquet shuffles both sides
    val un = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
    assert(un.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
