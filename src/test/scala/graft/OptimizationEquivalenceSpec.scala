package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocOps

/** Round-8 optimization equivalence proofs: every operator whose INTERNALS
  * changed for performance is pinned bit-for-bit against its previous
  * formulation here (the oracles re-prove the same thing externally).
  */
class OptimizationEquivalenceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("opt-equivalence")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** The round-2→7 simhash formulation, verbatim: explode the word stream,
    * per-(doc, word) tf, md5Hash60 per word, 60 tf-weighted bit sums, sign
    * threshold. The round-8 projection must reproduce it bit-for-bit.
    */
  private def simhashReference(d: DataFrame): DataFrame = {
    val wordTf = d
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .withColumn("h",
        conv(substring(md5(col("word")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until DocOps.SimhashBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, col("tf"))
        .otherwise(-col("tf"))).as(s"b$i")
    }
    val agg = wordTf.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until DocOps.SimhashBits).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  private def fpMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("simhash projection ≡ aggregation formulation on the sf0.001 corpus") {
    val got = fpMap(DocOps.simhash(docs))
    val want = fpMap(simhashReference(docs))
    assert(got.size === want.size)
    assert(got === want)
  }

  test("simhash projection ≡ aggregation formulation on adversarial rows") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      1L -> "",                                  // split("") = [""] → md5("")
      2L -> "   ",                               // trims to "" → [""]
      3L -> "\ta b\t",                           // trim() strips spaces only: leading \t survives → ["", "a", "b"]
      4L -> "one",
      5L -> "a a a a b",                         // tf weighting vs per-occurrence sums
      6L -> "x y x y",                           // exact ± cancellation → counter 0 → bit clear
      7L -> "café naïve 中文 中文", // multi-byte UTF-8
      8L -> "emoji 😀 pair 😀",           // astral (surrogate pair)
      9L -> "nbsp glued words",             // NBSP is \s in neither engine? (java \s excludes NBSP)
      10L -> "line\nbreaks\ttabs  doubled spaces",
      11L -> (1 to 3000).map(i => s"w${i % 7}").mkString(" ")) // heavy tf skew
      .toDF("doc_id", "text")
    assert(fpMap(DocOps.simhash(rows)) === fpMap(simhashReference(rows)))
  }

  test("simhash drops null-text rows exactly like the explode formulation") {
    val schema = StructType(Seq(StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "hello world"), Row(2L, null)), schema)
    val got = fpMap(DocOps.simhash(d))
    val want = fpMap(simhashReference(d))
    assert(got.keySet === Set(1L))
    assert(got === want)
  }

  /** The pre-round-8 verifyJaccard, verbatim: three full passes over the
    * shingle table (counts aggregation + both intersection sides).
    */
  private def verifyJaccardReference(candidates: DataFrame, sh: DataFrame,
                                     tau: Double): DataFrame = {
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("s"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("s"))
    val pairInter = candidates.join(shA, Seq("doc_a")).join(shB, Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("i"))
    pairInter
      .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .where(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  test("verifyJaccard candidate-pruned ≡ full-table formulation") {
    val sh = DocOps.shingles(docs)
    // candidate set: real LSH candidates of the corpus, plus a planted
    // non-near pair (exercises the below-tau path through both forms)
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(2)
      .collect().map(_.getLong(0))
    val s = spark
    import s.implicits._
    val planted = Seq((ids(0), ids(1))).toDF("doc_a", "doc_b")
    val cands = DocOps.lshCandidates(
      DocOps.lshBands(DocOps.minhashSignatures(sh)))
      .union(planted).distinct()
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toVector
    val got = key(DocOps.verifyJaccard(cands, sh, 0.5))
    val want = key(verifyJaccardReference(cands, sh, 0.5))
    assert(got === want)
    assert(got.nonEmpty, "corpus should contain verified near-dup pairs")
    graft.ops.CacheLedger.release()
  }

  test("ShingleStrings kernel ≡ transform/slice/concat_ws (+array_distinct) formulation") {
    import graft.functions.ShingleStrings.shingle_strings
    val s = spark
    import s.implicits._
    val rows = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++ Seq(
      (9001L, "a b c d e"),
      (9002L, "x x x x x x"),              // duplicate shingles → distinct path
      (9003L, "one two three"),            // exactly k words
      (9004L, "short two"),                // below k (caller-guarded, still compared)
      (9005L, "café 中文 😀 naïve x"), // multi-byte + astral
      (9006L, "a b c d e f"))         // NBSP inside a "word"
    val d = rows.toDF("doc_id", "text")
    for (k <- Seq(2, 3, 13); distinct <- Seq(true, false)) {
      val words = split(trim(col("text")), "\\s+")
      val ref0 = transform(sequence(lit(1), size(words) - (k - 1)),
        i => concat_ws(" ", slice(words, i, lit(k))))
      val ref = if (distinct) array_distinct(ref0) else ref0
      val got = d.where(size(words) >= k)
        .select(col("doc_id"), shingle_strings(words, k, distinct).as("a"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = d.where(size(words) >= k)
        .select(col("doc_id"), ref.as("a"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(got === want, s"k=$k distinct=$distinct")
    }
  }

  test("keepersDeltaIncremental: delta ∪ labels0 (newest wins) ≡ full incremental relabel") {
    val s = spark
    import s.implicits._
    def words(from: Int, to: Int): String =
      (from to to).map(i => s"tok$i").mkString(" ")
    // old corpus: two components {10,11} (root 10) and {21,22} (root 21)
    // + isolated 30
    val old = Seq((10L, words(1, 20)), (11L, words(1, 20)),
      (21L, words(100, 119)), (22L, words(100, 119)),
      (30L, words(300, 319))).toDF("doc_id", "text")
    val labels0 = DocOps.keepersFromEdges(old, DocOps.simhashEdges(old))
      .localCheckpoint(true)
    // append: doc 5's id is SMALLER than root 10 and shares its text, so
    // the merged component minimum MOVES — the old docs {10, 11} must be
    // RELABELED to 5 (the delta's old-doc branch); 50 extends {21,22}
    // without moving its root; 60 joins nobody
    val app = Seq((5L, words(1, 20)), (50L, words(100, 119)),
      (60L, words(500, 519))).toDF("doc_id", "text")
    val all = old.union(app)
    val (edges, _) = DocOps.simhashEdgesAppend(DocOps.simhashIndex(old), app)
    def lab(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = lab(DocOps.keepersFromEdgesIncremental(
      all.select("doc_id"), labels0, edges))
    val delta = lab(DocOps.keepersDeltaIncremental(
      app.select("doc_id"), labels0, edges))
    // the root move relabels BOTH old members of {10,11}; the unmoved
    // component and the isolated old doc contribute no delta rows
    assert(delta.get(10L) === Some(5L) && delta.get(11L) === Some(5L))
    assert(!delta.contains(21L) && !delta.contains(22L) && !delta.contains(30L))
    // delta rows only for appended docs + relabeled old docs
    assert(delta.keySet.intersect(Set(10L, 11L, 21L, 22L, 30L))
      .forall(d => full(d) !== lab(labels0)(d)))
    // resolution: delta overrides labels0, rest unchanged
    val resolved = lab(labels0) ++ delta
    assert(resolved === full)
    assert(full(10L) === 5L && full(50L) === 21L && full(60L) === 60L)
    // appended docs are always present in the delta
    assert(Set(5L, 50L, 60L).subsetOf(delta.keySet))
    graft.ops.CacheLedger.release()
  }
}
