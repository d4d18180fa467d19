package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Extract, ResultJson}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Two query families:
  *  - `extract_*` / `doc_fanin`: the flagship dots.ocr extraction pipeline
  *    over the deterministic transcripts corpus (data/transcripts_t2). Their
  *    oracles read the FROZEN GOLDEN parquet generated from the reference's
  *    own Python (src/test/resources/expected_t2.parquet) — so the DuckDB
  *    compare enforces the per-turn byte-equality contract.
  *  - relational/doc/vector ops over the sfDir tables with ANSI-SQL oracles.
  */
object SparkEntry {

  val TranscriptsT2 = "/root/repo/data/transcripts_t2"
  val ExpectedT2 = "/root/repo/src/test/resources/expected_t2.parquet"

  /** Flagship query on sf=0.001-scale transcripts; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    extractResult(spark, "/root/repo/data/transcripts_t1")

  /** Extraction result projected to the golden-comparable columns. */
  private def extractResult(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    Extract.run(spark, path)
      .map(r => (r.conv_id, r.turn_idx, r.input_width, r.input_height,
        r.cells_json, r.md, r.md_nohf, r.filtered, ResultJson.spansJson(r.spans)))
      .toDF("conv_id", "turn_idx", "input_width", "input_height",
        "cells_json", "md", "md_nohf", "filtered", "spans_json")
      .orderBy("conv_id", "turn_idx")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship extraction (oracle = frozen reference output) ----
    "extract_turns" -> ((s, _) => extractResult(s, TranscriptsT2)),

    "extract_report" -> ((s, _) => {
      val res = Extract.run(s, TranscriptsT2).toDF()
      res.agg(
        count(lit(1)).as("total_cases"),
        sum(when(col("filtered"), 1L).otherwise(0L)).as("filtered_cases"),
        sum(length(coalesce(col("md"), lit("")))).as("total_md_chars"))
    }),

    "doc_fanin" -> ((s, _) =>
      Extract.docFanIn(Extract.run(s, TranscriptsT2).toDF()).orderBy("conv_id")),

    // ---- relational operators over the sfDir tables ----
    // A2-style hash aggregation with partial aggregation (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J2-style equi-join; orders side is the smaller input → broadcast-able
    "q3_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // O5 relational form: first-occurrence dedup via row_number()=1
    "dedup_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // the order must be total or row_number() is engine-dependent
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    }),

    // O1 stable ordering + window rank within conversation-like groups
    "events_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("seq", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(max(col("seq")).as("n_events"), sum(col("value")).as("total_value"))
        .orderBy(col("user_id"))
    })
  )

  /** ANSI SQL oracles (DuckDB). Column names must match the Spark output. */
  def oracleSql: Map[String, String] = Map(
    "extract_turns" ->
      s"""SELECT conv_id, turn_idx, input_width, input_height, cells_json, md, md_nohf, filtered, spans_json FROM read_parquet('$ExpectedT2') ORDER BY conv_id, turn_idx""",

    "extract_report" ->
      s"""SELECT count(*) AS total_cases, sum(CASE WHEN filtered THEN 1 ELSE 0 END) AS filtered_cases, sum(length(coalesce(md,''))) AS total_md_chars FROM read_parquet('$ExpectedT2')""",

    "doc_fanin" ->
      s"""SELECT conv_id, string_agg(md, e'\\n\\n---\\n\\n' ORDER BY turn_idx) AS doc_md, count(*) AS n_pages FROM read_parquet('$ExpectedT2') WHERE md IS NOT NULL GROUP BY conv_id ORDER BY conv_id""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, sum(l_extendedprice) AS sum_base_price, sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price, avg(l_discount) AS avg_disc, count(*) AS count_order FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q3_join" ->
      """SELECT o_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "dedup_rank" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM (SELECT l_orderkey, l_partkey, l_quantity, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem) t WHERE rn = 1 ORDER BY l_orderkey""",

    "events_window" ->
      """SELECT user_id, max(seq) AS n_events, sum(value) AS total_value FROM (SELECT user_id, value, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq FROM events) t GROUP BY user_id ORDER BY user_id"""
  )
}
