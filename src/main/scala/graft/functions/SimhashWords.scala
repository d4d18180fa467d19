package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash fingerprint of a word array in ONE pass per row — the
  * per-row kernel that lets [[graft.ops.DocOps.simhash]] be a pure
  * projection (round 8; guide §2.4 "remove shuffles outright").
  *
  * Replaces the two-shuffle Column formulation
  * `explode(words) → groupBy(doc_id, word).count → 60 × sum(±tf)`:
  * a per-doc fingerprint needs NO cross-row data, so exploding the word
  * stream and shuffling (doc_id, word) strings (then 60 agg columns) was
  * pure overhead — the whole corpus's token stream crossed an exchange to
  * compute a value each row can produce locally.
  *
  * Bit-exactness vs that formulation (spec-asserted on the corpus +
  * adversarial rows, and re-proven by the unchanged `doc_simhash_*`
  * oracles):
  *  - per word, the hash is md5Hash60 = the md5 hex prefix
  *    `conv(substring(md5(w),1,15),16,10)` — here read directly from the
  *    first 7.5 digest bytes (identical value, no hex round-trip);
  *  - the tf-weighted per-bit sum over DISTINCT words,
  *    Σ_w (bit_i(h_w) ? +tf_w : −tf_w), equals the per-OCCURRENCE sum
  *    Σ_occ (bit_i ? +1 : −1) — integer arithmetic, so summation order
  *    and grouping are immaterial;
  *  - bit i of the fingerprint is set iff the (strictly positive) sum is
  *    > 0, exactly the Column form's `when(b_i > 0, 1<<i)`.
  *
  * The caller applies this to `split(trim(text), "\\s+")`, so the word
  * segmentation itself stays Spark's own builtin — no re-implementation
  * of trim/split semantics to drift.
  */
case class SimhashWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_words expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashWords.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SimhashWords.fingerprint($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashWords {

  val Bits = 60

  private val threadMd = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared eval/codegen kernel. One md5 per word occurrence; counters are
    * ints (a single doc would need 2³¹ same-bit occurrences to overflow —
    * impossible below 8 GiB of text in one row).
    */
  def fingerprint(words: ArrayData): Long = {
    val md = threadMd.get()
    val counts = new Array[Int](Bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        md.reset()
        val b = w.getBytes
        md.update(b, 0, b.length)
        val d = md.digest()
        // first 15 hex chars of md5 = digest bytes 0..6 + high nibble of 7,
        // read as an unsigned 60-bit integer (≡ conv(substr(md5,1,15),16,10))
        val h = ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) |
          ((d(2) & 0xFFL) << 36) | ((d(3) & 0xFFL) << 28) |
          ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
          ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >>> 4)
        var j = 0
        while (j < Bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Column API: the 60-bit fingerprint of a words array. */
  def simhash_words(words: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimhashWords(GraftColumnBridge.expression(words)))
  }
}
