package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Counts of characters falling in each of several code-point range
  * classes, in ONE pass over the string's UTF-8 bytes.
  *
  * Replaces the `length(t) - length(regexp_replace(t, "[class]", ""))`
  * idiom, which runs one full regex pass AND allocates one stripped copy
  * of the text PER CLASS — the language-ID profile needed four of them,
  * quality scoring two more. This expression decodes each code point once
  * and tests it against all classes: no allocation beyond the fixed-size
  * result, no regex machinery (SURVEY §2.11 "selected hot ones as custom
  * Expression").
  *
  * Semantics match the regex idiom exactly for BMP range classes (ours
  * all are): each matching char is one UTF-16 unit, so unit counts equal
  * code-point counts; astral code points (≥ U+10000) match no BMP class
  * in either formulation (spec-asserted vs the regex formulation,
  * including surrogates). Malformed UTF-8 (possible via binary→string
  * casts of unvalidated parquet bytes) never reads past the buffer: a
  * truncated multi-byte tail counts as one no-class code point.
  * `classes` is plan-time static, like [[MinhashMix]]'s n.
  */
case class CharClassCounts(child: Expression, classes: Seq[Seq[(Int, Int)]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_class_counts expects string, got ${child.dataType.simpleString}")

  private lazy val encoded: Array[Array[Int]] =
    classes.map(_.flatMap(r => Seq(r._1, r._2)).toArray).toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharClassCounts.countAll(input.asInstanceOf[UTF8String], encoded))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranges = ctx.addReferenceObj("ccRanges", encoded, "int[][]")
    defineCodeGen(ctx, ev, s =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CharClassCounts.countAll($s, $ranges))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharClassCounts {

  /** Shared eval/codegen kernel: decode UTF-8 code points, test each
    * against every class's (lo, hi) pairs (flattened [lo0,hi0,lo1,hi1,…]).
    */
  def countAll(s: UTF8String, classes: Array[Array[Int]]): Array[Long] = {
    val out = new Array[Long](classes.length)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xE0) len = 2
      else if (b0 < 0xF0) len = 3
      else len = 4 // astral: in no BMP class
      if (len > 1) {
        // Spark guarantees valid UTF-8 for strings it built itself, but a
        // binary parquet column cast to string is NOT validated — a
        // truncated multi-byte sequence at end-of-buffer must not drive
        // getByte (Platform.getByte, unbounded) past the allocation.
        // Treat the malformed tail as a single no-class code point.
        if (i + len > n) { cp = -1; len = n - i }
        else if (len == 2) cp = ((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F)
        else if (len == 3) cp = ((b0 & 0x0F) << 12) |
          ((s.getByte(i + 1) & 0x3F) << 6) | (s.getByte(i + 2) & 0x3F)
        else cp = 0x10000
      }
      var c = 0
      while (c < classes.length) {
        val rs = classes(c)
        var j = 0
        var hit = false
        while (!hit && j < rs.length) {
          if (cp >= rs(j) && cp <= rs(j + 1)) hit = true
          j += 2
        }
        if (hit) out(c) += 1L
        c += 1
      }
      i += len
    }
    out
  }

  /** Column API: one array<long> of per-class counts. */
  def char_class_counts(c: Column, classes: Seq[Seq[(Int, Int)]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CharClassCounts(GraftColumnBridge.expression(c), classes))
  }
}
