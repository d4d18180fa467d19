package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Elementwise MIN of an `array<long>` column — the MinHash signature
  * aggregate: sig[i] = min over a doc's shingles of hash-family i.
  *
  * Replaces a 128-column `agg(min(h0), …, min(h127)) + array(...)`: one
  * compact long[] buffer per group instead of 128 boxed aggregation
  * buffers, one 8·n-byte partial per partition through the shuffle.
  * Exactly the [[VectorSumL]] shape with min instead of sum — both are
  * associative+commutative, so partials merge on any partitioning.
  */
case class VectorMinL(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def grown(buf: Array[Long], n: Int): Array[Long] = {
    val b = java.util.Arrays.copyOf(buf, n)
    java.util.Arrays.fill(b, buf.length, n, Long.MaxValue)
    b
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length >= n) buf else grown(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getLong(i)
        if (x < b(i)) b(i) = x
      }
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b2.length > b1.length) return merge(b2, b1)
    var i = 0
    while (i < b2.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
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
  override def prettyName: String = "vec_lmin"

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMinL =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMinL =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMinL =
    copy(child = newChild)
}

object VectorMinL {
  /** Column API surface. */
  def vec_lmin(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      VectorMinL(GraftColumnBridge.expression(c)).toAggregateExpression())
  }
}
