package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-word shingle strings of a word array in ONE compiled pass —
  * optionally first-occurrence-distinct (round 8; guide §1.2 step 2,
  * per-task work).
  *
  * Replaces the Column idiom
  * `transform(sequence(1, size(w)−k+1), i → concat_ws(" ", slice(w, i, k)))`
  * (+ `array_distinct` on the distinct paths): higher-order functions are
  * CodegenFallback in Spark, so that formulation ran its lambda
  * INTERPRETED per window with a fresh slice array per shingle — the
  * dominant map-stage CPU of the MinHash and decontamination families at
  * scale. This kernel emits the identical strings (UTF8String.concatWs
  * over the same k elements — byte-equal to concat_ws/array_join with a
  * single-space separator on null-free word arrays, which `split` always
  * produces) in the identical order (window index order; distinct keeps
  * first occurrences, exactly `array_distinct`'s contract).
  * Equivalence is spec-asserted element-for-element on the corpus and
  * adversarial rows; the shingle-consuming oracles are unchanged.
  *
  * The caller keeps its own `size(w) >= k` guard; inputs shorter than k
  * yield an empty array either way.
  */
case class ShingleStrings(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_strings expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.shingleAll(input.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.ShingleStrings.shingleAll($s, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {

  private val Space = UTF8String.fromString(" ")

  /** Shared eval/codegen kernel. */
  def shingleAll(words: ArrayData, k: Int, distinct: Boolean): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](n - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(Space, parts: _*)
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Column API: array of the k-word shingles of `words`. */
  def shingle_strings(words: Column, k: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      ShingleStrings(GraftColumnBridge.expression(words), k, distinct))
  }
}
