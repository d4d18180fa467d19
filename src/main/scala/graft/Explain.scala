package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // predicate pushdown through to the scan under the object stage
    val r = graft.pipeline.Extract.readTranscripts(spark, "/root/repo/data/transcripts_t2")
      .where($"turn_idx".between(2, 5))
    println("=== extract_range input scan ===")
    r.explain("formatted")
    println("=== q3_join ===")
    SparkEntry.queries("q3_join")(spark, "/root/testdata/sf0.01").explain("formatted")
    // round-5 heavies: audit for accidental cartesian joins / text
    // through exchanges / unexpected extra shuffles
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    println("=== doc_corpus_clean ===")
    graft.ops.DocOps.cleanCorpus(docs).explain("formatted")
    println("=== doc_ngram_repetition ===")
    graft.ops.DocOps.ngramRepetition(docs).explain("formatted")
    println("=== doc_pack_sequences ===")
    graft.ops.DocOps.packSequences(docs).explain("formatted")
    spark.stop()
  }
}
