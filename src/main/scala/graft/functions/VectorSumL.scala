package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise FIXED-POINT sum of an `array<double>` column as a custom
  * [[TypedImperativeAggregate]]: each component is quantized to a long via
  * `floor(v * scale + 0.5)` (round-half-up — floor/mul are IEEE-exact and
  * engine-portable, unlike each engine's own `round`) and summed with exact
  * integer arithmetic.
  *
  * Why not `avg` over `posexplode`: (a) the explode shuffles dim× the row
  * count where this aggregate ships one 8·dim-byte partial per partition —
  * the k-means Lloyd update becomes ONE narrow N-row shuffle; (b) float
  * summation is order-dependent, so a parallel mean is NOT reproducible
  * run-to-run, while the integer sum is associative-commutative-EXACT —
  * the same centroids on any partitioning, any cluster size, and any other
  * engine (the DuckDB oracle recomputes the whole k-means trainer
  * bit-for-bit; overflow is unreachable for |v|·scale ≲ 2^53 components
  * summed over < 2^10 rows per cell at oracle scale, and a corpus-scale
  * caller picks `scale` to budget |v|·scale·N < 2^63).
  */
case class VectorSumL(
    child: Expression,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        b(i) += math.floor(arr.getDouble(i) * scale + 0.5).toLong
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length > b1.length) return merge(b2, b1)
    var i = 0
    while (i < b2.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val out = new Array[Long](storage.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_lsum"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumL =
    copy(child = newChild)
}

object VectorSumL {
  /** Column API surface. */
  def vec_lsum(c: Column, scale: Double): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      VectorSumL(GraftColumnBridge.expression(c), scale).toAggregateExpression())
  }
}
