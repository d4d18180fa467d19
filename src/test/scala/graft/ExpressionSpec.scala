package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions

class ExpressionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("expr-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("DotProduct equals the HOF formulation bit-for-bit on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val a = emb.select(col("vec_id").as("ida"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("idb"), col("e").as("eb"))
    val pairs = a.join(b, col("ida") < col("idb")).limit(5000)
    val hof = aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val native = VectorExpressions.dot_product(col("ea"), col("eb"))
    val diff = pairs.select(col("ida"), col("idb"), hof.as("h"), native.as("n"))
      .where(col("h") =!= col("n")) // bit-exact, not approximate
      .count()
    assert(diff === 0L)
  }

  test("dot_product is registered for the SQL surface") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 32.0)
  }

  test("DotProduct codegen path evaluates (whole-stage codegen plan)") {
    val df = spark.range(100).select(
      VectorExpressions.dot_product(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), col("id").cast("double"))).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.agg(sum(col("d"))).collect()(0).getDouble(0) === (0 until 100).map(i => 3.0 * i + 2.0 * i).sum)
  }

  test("SignProjectBuckets equals the HOF bucket fold bit-for-bit on real embeddings") {
    import graft.ops.VectorOps
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val nBits = 10; val nTables = 8
    val planesLit = typedLit(VectorOps.planes(64, nBits, nTables))
    // the round-2 interpreted formulation, reconstructed verbatim
    val proj = transform(planesLit, p =>
      aggregate(zip_with(col("e"), p, (x, y) => x * y), lit(0.0), (a, x) => a + x))
    val hof = transform(sequence(lit(0), lit(nTables - 1)), t =>
      aggregate(slice(proj, t * lit(nBits) + 1, lit(nBits)), lit(0L),
        (acc, x) => acc * 2 + when(x > 0, 1L).otherwise(0L)))
    val native = VectorExpressions.sign_project_buckets(
      col("e"), planesLit, nBits, nTables)
    val diff = emb.select(hof.as("h"), native.as("n"))
      .where(not(col("h") <=> col("n"))).count()
    assert(diff === 0L)
  }

  test("SignProjectBuckets codegen path evaluates (whole-stage codegen plan)") {
    import graft.ops.VectorOps
    val planesLit = typedLit(VectorOps.planes(2, 4, 3))
    val df = spark.range(50).select(
      graft.functions.VectorExpressions.sign_project_buckets(
        array(col("id").cast("double"), lit(-1.0)), planesLit, 4, 3).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val codes = df.collect().map(_.getSeq[Long](0))
    assert(codes.forall(cs => cs.length === 3 && cs.forall(c => c >= 0 && c < 16)))
  }

  test("MinhashMix matches the SplitMix64 stream; signatures repartition-invariant") {
    import graft.functions.MinhashMix
    import graft.ops.DocOps
    // expression == the reference JVM implementation, through codegen
    val rows = spark.range(500).select(
      org.apache.spark.sql.functions.xxhash64(col("id")).as("h"))
    val got = rows.select(col("h"), MinhashMix.minhash_mix(col("h"), 16).as("m"))
      .collect()
    got.foreach { r =>
      val h = r.getLong(0)
      val expect = (0 until 16).map(i => MinhashMix.mix(h + (i + 1) * MinhashMix.Phi))
      assert(r.getSeq[Long](1) === expect)
    }
    // VectorMinL partials merge identically on any partitioning
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = DocOps.minhashSignatures(DocOps.shingles(docs)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = DocOps.minhashSignatures(DocOps.shingles(docs).repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
    assert(a.values.forall(_.length === DocOps.NumHashes))
  }

  test("CharClassCounts equals the regex idiom on adversarial unicode, codegen runs") {
    import graft.functions.CharClassCounts.char_class_counts
    import graft.ops.DocOps
    val s = spark
    import s.implicits._
    // adversarial inputs: every script class, class boundaries, astral
    // (4-byte UTF-8) chars, empty, pure ASCII punct, mixed
    val rnd = new scala.util.Random(42)
    val pools = Seq(
      ('A' to 'Z') ++ ('a' to 'z'), '0' to '9', '!' to '/', ':' to '@',
      (0x4E00 to 0x4E20).map(_.toChar), Seq(0x4DFF.toChar, 0xA000.toChar),
      (0x400 to 0x40F).map(_.toChar), Seq(0x3FF.toChar, 0x500.toChar),
      (0x600 to 0x60F).map(_.toChar), Seq(0x5FF.toChar, 0x700.toChar),
      Seq(' ', '\n', '\t'), Seq(0x1F600, 0x1F4A9).flatMap(Character.toChars(_).toSeq))
    val cases = Seq("", "plain ascii text!", "混合 mixed 文字 and Ж ع") ++
      (1 to 200).map { _ =>
        val len = rnd.nextInt(40)
        (0 until len).map { _ =>
          val p = pools(rnd.nextInt(pools.size)); p(rnd.nextInt(p.size))
        }.mkString
      }
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val classes = DocOps.ScriptClasses ++ DocOps.QualityClasses
    val regexes = Seq("[A-Za-z]", "[\\u4E00-\\u9FFF]", "[\\u0400-\\u04FF]",
      "[\\u0600-\\u06FF]", "[!-/:-@\\[-`{-~]", "[0-9]")
    val cc = col("__cc")
    val checks = regexes.zipWithIndex.map { case (re, i) =>
      (cc.getItem(i) =!=
        (length(col("text")) - length(regexp_replace(col("text"), re, "")))
          .cast("long")).as(s"bad$i")
    }
    val bad = df.withColumn("__cc", char_class_counts(col("text"), classes))
      .where(checks.reduce(_ || _)).count()
    assert(bad === 0L)
    // the rewired ops still equal their regex formulations on real docs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val oldLang = docs.select(col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), "[A-Za-z]", "")))
        .cast("long").as("latin_chars"))
    val newLang = DocOps.langId(docs).select(col("doc_id"), col("latin_chars"))
    assert(newLang.exceptAll(oldLang).count() === 0L)
    // codegen path actually runs (no fallback): the `*(n)` prefix marks
    // whole-stage-codegen stages, and the expression sits inside one
    val plan = DocOps.langId(docs).queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("charclasscounts"), plan)
  }

  test("CharClassCounts never reads past a truncated multi-byte UTF-8 tail") {
    import graft.functions.CharClassCounts
    import org.apache.spark.unsafe.types.UTF8String
    val classes = (graft.ops.DocOps.ScriptClasses ++
      graft.ops.DocOps.QualityClasses)
      .map(_.flatMap(r => Seq(r._1, r._2)).toArray).toArray
    // valid prefix "aZ9!" + every truncated-leading-byte shape: 2-byte
    // lead alone, 3-byte lead with 0 and 1 continuations, 4-byte lead
    // with 0..2 continuations — each buffer ENDS inside a sequence, the
    // exact case that drove unchecked getByte past the allocation
    val prefix = "aZ9!".getBytes("UTF-8")
    val tails = Seq(
      Array(0xC3), Array(0xE4), Array(0xE4, 0xB8), Array(0xF0),
      Array(0xF0, 0x9F), Array(0xF0, 0x9F, 0x98)).map(_.map(_.toByte))
    for (tail <- tails) {
      val out = CharClassCounts.countAll(
        UTF8String.fromBytes(prefix ++ tail), classes)
      // the malformed tail is one no-class code point; the valid prefix
      // still counts (1 latin-ish a, 1 A-Z, 1 digit, 1 punct)
      assert(out.toSeq === Seq(2L, 0L, 0L, 0L, 1L, 1L), tail.mkString(","))
    }
    // a truncated tail mid-buffer (continuation bytes replaced by a valid
    // ASCII byte) stays in-bounds too and the trailing ASCII still counts
    val weird = UTF8String.fromBytes(prefix ++ Array(0xE4.toByte, 'x'.toByte))
    val out2 = CharClassCounts.countAll(weird, classes)
    assert(out2.sum >= 4L) // no crash, prefix counted; 0xE4 consumed 'x'
  }

  test("null semantics: null array -> null; short arrays use common prefix") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a, " +
        "dot_product(array(1.0d, 2.0d), array(3.0d)) AS b").collect()(0)
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 3.0)
  }

  test("HLL sketch: estimate within 5% of exact distinct; invariant under repartitioning") {
    import graft.functions.HllSketch
    import graft.ops.DocOps
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val words = docs.select(explode(split(trim(col("text")), "\\s+")).as("word"))
    val exact = words.distinct().count()
    val hex = DocOps.wordHll(docs).collect()(0).getString(0)
    assert(hex.length === 2048)
    val est = HllSketch.estimate(hex)
    info(f"HLL estimate $est%.0f vs exact $exact (err ${100 * math.abs(est - exact) / exact}%.1f%%)")
    assert(math.abs(est - exact) / exact <= 0.05)
    // large-cardinality regime (the HLL path, not linear counting):
    // 200k distinct hashes, 1024 registers -> sigma ~3.25%; assert 3 sigma
    val hexBig = spark.range(200000).toDF("id")
      .select(graft.ops.DocOps.md5Hash60(col("id").cast("string")).as("h"))
      .agg(HllSketch.hll_sketch(col("h"))).collect()(0).getString(0)
    val estBig = HllSketch.estimate(hexBig)
    info(f"HLL estimate $estBig%.0f vs exact 200000 (err ${100 * math.abs(estBig - 200000) / 200000}%.1f%%)")
    assert(math.abs(estBig - 200000.0) / 200000.0 <= 0.10)
    // partial/merge correctness: any partitioning yields the identical sketch
    val hex7 = DocOps.wordHll(docs.repartition(7)).collect()(0).getString(0)
    assert(hex7 === hex)
    // sketch of a subset never exceeds the full sketch registerwise
    val hexHalf = DocOps.wordHll(docs.where(col("doc_id") % 2 === 0)).collect()(0).getString(0)
    val regs = (0 until 1024).map(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16))
    val regsHalf = (0 until 1024).map(i => Integer.parseInt(hexHalf.substring(2 * i, 2 * i + 2), 16))
    assert(regsHalf.zip(regs).forall { case (h, f) => h <= f })
  }
}
