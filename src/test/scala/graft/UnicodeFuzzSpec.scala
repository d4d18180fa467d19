package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DocOps

/** Adversarial-unicode differential fuzz for the regex/HOF-based text ops
  * (round 6; VERDICT item 6): [[DocOps.piiScrub]], [[DocOps.gopherRules]],
  * and [[DocOps.ngramRepetition]] are replayed on the driver with plain
  * JVM string/regex code implementing the SAME contract, over generated
  * docs stuffed with astral chars, lone surrogates, NBSP / U+2028
  * separators, bullets, ellipses and PII-shaped tokens — engine ≡ oracle
  * on every generated case, all columns, doubles compared EXACTLY.
  *
  * The oracle replicates Spark string semantics precisely where they
  * differ from the obvious JVM calls:
  *  - `length()` counts CODE POINTS (UTF8String.numChars), not UTF-16
  *    units → codePointCount;
  *  - `split(re)` keeps trailing empties (limit -1), unlike
  *    String.split's default;
  *  - `trim()` strips only ' ' (0x20), unlike String.trim's ≤0x20;
  *  - strings round-trip through UTF-8 before the engine sees them, so a
  *    lone surrogate becomes '?' — the generator normalizes first and the
  *    oracle reads the normalized form.
  */
class UnicodeFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("unicode-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- Spark string semantics on the JVM ----

  /** What the engine actually stores: the UTF-8 round-trip (lone
    * surrogates → '?').
    */
  private def utf8Norm(s: String): String = new String(s.getBytes(UTF_8), UTF_8)

  /** Spark `length(str)`: code points, not UTF-16 units. */
  private def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Spark `trim(str)`: leading/trailing ' ' only. */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Spark `split(str, re)`: Java regex with limit -1 (trailing empties kept). */
  private def sparkSplit(s: String, re: String): Array[String] =
    Pattern.compile(re).split(s, -1)

  private def wsWords(s: String): Array[String] = sparkSplit(sparkTrim(s), "\\s+")

  private def countMatches(s: String, re: String): Long = {
    val m = Pattern.compile(re).matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  // ---- generator ----

  private def cases: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260817)
    val tokens = Seq(
      "the", "be", "to", "of", "and", "that", "have", "with", // Gopher stops
      "word", "averagely", "x", "supercalifragilistic",
      "#", "##", "...", "….", "…", "..", "•bullet", "- dash", "* star",
      "混合", "文字", "Ж", "ع", "😀", "💩", // astral
      "\uD800", "\uDC00", // lone surrogates (→ '?' after UTF-8 round-trip)
      "a@b.com", "user.name+tag@example.co.uk", "not@an@email",
      "1.2.3.4", "10.200.30.40", "999.999.999.999", "1.2.3",
      "+1 (555) 123-4567", "+442071234567", "+12 3456789",
      "42", "3.14", "a1b2", "", " ")
    val seps = Seq(" ", "  ", "\n", "\n\n", "\t", " ", " ",
      "   ", "")
    val fixed = Seq(
      "", " ", "\n", " ", " ", "\uD800", "😀",
      "• one\n• two\n• three", "end...\nend…\nend",
      "the be to of and that have with " * 8,
      "dup gram dup gram dup gram dup gram dup gram",
      "a@b.com at 1.2.3.4 call +1 (555) 123-4567 twice a@b.com")
    val generated = (1 to 150).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map { _ =>
        val t = tokens(rnd.nextInt(tokens.size))
        val sep = seps(rnd.nextInt(seps.size))
        t + sep
      }.mkString
    }
    (fixed ++ generated).zipWithIndex.map { case (t, i) =>
      (i.toLong, utf8Norm(t))
    }
  }

  test("piiScrub ≡ JVM regex replay on adversarial unicode") {
    val s = spark
    import s.implicits._
    val df = cases.toDF("doc_id", "text")
    val got = DocOps.piiScrub(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size === cases.size)
    for ((id, text) <- cases) {
      val afterEmail = text.replaceAll(DocOps.EmailRe, "<EMAIL>")
      val afterIp = afterEmail.replaceAll(DocOps.Ipv4Re, "<IP>")
      val afterPhone = afterIp.replaceAll(DocOps.PhoneRe, "<PHONE>")
      val r = got(id)
      assert(r.getInt(1).toLong === countMatches(text, DocOps.EmailRe), s"doc $id emails")
      assert(r.getInt(2).toLong === countMatches(afterEmail, DocOps.Ipv4Re), s"doc $id ips")
      assert(r.getInt(3).toLong === countMatches(afterIp, DocOps.PhoneRe), s"doc $id phones")
      assert(r.getString(4) === afterPhone, s"doc $id redacted")
    }
  }

  test("gopherRules ≡ JVM replay on adversarial unicode (all columns, exact doubles)") {
    val s = spark
    import s.implicits._
    val df = cases.toDF("doc_id", "text")
    val got = DocOps.gopherRules(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val alphaRe = Pattern.compile("[A-Za-z]")
    for ((id, text) <- cases) {
      val words = wsWords(text)
      val nWords = if (sparkTrim(text).isEmpty) 0L else words.length.toLong
      val wordChars = words.map(cpLen).sum
      val lines = sparkSplit(text, "\n")
      val nLines = lines.length.toLong
      val bulletLines = lines.count(l =>
        l.startsWith("•") || l.startsWith("- ") || l.startsWith("* ")).toLong
      val ellipsisLines = lines.count(l =>
        l.endsWith("...") || l.endsWith("…")).toLong
      val alphaWords = words.count(w => alphaRe.matcher(w).find()).toLong
      val symbols = (cpLen(text) - cpLen(text.replace("#", ""))) +
        countMatches(text, "\\.\\.\\.|…")
      val stops = gopherStops.count(words.contains).toLong
      val meanWordLen = if (nWords == 0L) 0.0 else wordChars.toDouble / nWords.toDouble
      val symbolRatio = if (nWords == 0L) 0.0 else symbols.toDouble / nWords.toDouble
      val bulletFrac = bulletLines.toDouble / nLines.toDouble
      val ellipsisFrac = ellipsisLines.toDouble / nLines.toDouble
      val alphaFrac = if (nWords == 0L) 0.0 else alphaWords.toDouble / nWords.toDouble
      val pass = nWords >= 50L && nWords <= 100000L &&
        meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
        symbolRatio <= 0.1 && bulletFrac < 0.9 && ellipsisFrac < 0.3 &&
        alphaFrac >= 0.8 && stops >= 2L
      val r = got(id)
      val dbg = s"doc $id: ${text.take(60)}"
      assert(r.getLong(1) === nWords, s"$dbg n_words")
      assert(r.getLong(2) === wordChars, s"$dbg word_chars")
      assert(r.getLong(3) === nLines, s"$dbg n_lines")
      assert(r.getLong(4) === bulletLines, s"$dbg bullet_lines")
      assert(r.getLong(5) === ellipsisLines, s"$dbg ellipsis_lines")
      assert(r.getLong(6) === alphaWords, s"$dbg alpha_words")
      assert(r.getLong(7) === symbols, s"$dbg symbols")
      assert(r.getLong(8) === stops, s"$dbg stops_present")
      assert(r.getDouble(9) === meanWordLen, s"$dbg mean_word_len")
      assert(r.getDouble(10) === symbolRatio, s"$dbg symbol_ratio")
      assert(r.getDouble(11) === bulletFrac, s"$dbg bullet_frac")
      assert(r.getDouble(12) === ellipsisFrac, s"$dbg ellipsis_frac")
      assert(r.getDouble(13) === alphaFrac, s"$dbg alpha_frac")
      assert(r.getBoolean(14) === pass, s"$dbg gopher_pass")
    }
  }

  test("ngramRepetition ≡ JVM replay on adversarial unicode") {
    val s = spark
    import s.implicits._
    val df = cases.toDF("doc_id", "text")
    val got = DocOps.ngramRepetition(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    graft.ops.CacheLedger.release()
    assert(got.size === cases.size)
    def grams(words: Array[String], n: Int): Seq[String] =
      if (words.length < n) Seq.empty
      else (0 to words.length - n).map(i => words.slice(i, i + n).mkString(" "))
    for ((id, text) <- cases) {
      val nChars = cpLen(text)
      val words =
        if (sparkTrim(text).isEmpty) Array.empty[String] else wsWords(text)
      def tf(n: Int): Map[String, Long] =
        grams(words, n).groupBy(identity).map { case (g, o) => g -> o.length.toLong }
      def topChars(n: Int): Long = {
        val t = tf(n)
        if (t.isEmpty) 0L
        else {
          // engine order: tf DESC, gram ASC — Spark compares strings by
          // UNSIGNED UTF-8 bytes (UTF8String.compareTo), which differs
          // from String.compareTo around supplementary chars; use the
          // byte-wise ordering to be faithful
          val top = t.toSeq.minBy[(Long, String)] { case (g, c) => (-c, g) }(
            Ordering.Tuple2(Ordering.Long, utf8Ordering))
          top._2 * cpLen(top._1)
        }
      }
      def dupChars(n: Int): Long =
        tf(n).collect { case (g, c) if c >= 2L => c * cpLen(g) }.sum
      def frac(chars: Long): Double =
        if (nChars == 0L) 0.0 else chars.toDouble / nChars.toDouble
      val r = got(id)
      val dbg = s"doc $id: ${text.take(60)}"
      assert(r.getLong(1) === nChars, s"$dbg n_chars_m")
      assert(r.getDouble(2) === frac(topChars(2)), s"$dbg top2_frac")
      assert(r.getDouble(3) === frac(topChars(3)), s"$dbg top3_frac")
      assert(r.getDouble(4) === frac(topChars(4)), s"$dbg top4_frac")
      assert(r.getDouble(5) === frac(dupChars(5)), s"$dbg dup5_frac")
      assert(r.getDouble(6) === frac(dupChars(10)), s"$dbg dup10_frac")
    }
  }

  /** Spark's string `<` compares UTF-8 bytes unsigned (UTF8String.compareTo). */
  private val utf8Ordering: Ordering[String] = (a: String, b: String) => {
    val x = a.getBytes(UTF_8)
    val y = b.getBytes(UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    var res = 0
    while (res == 0 && i < n) {
      res = java.lang.Integer.compare(x(i) & 0xFF, y(i) & 0xFF)
      i += 1
    }
    if (res != 0) res else java.lang.Integer.compare(x.length, y.length)
  }
}
