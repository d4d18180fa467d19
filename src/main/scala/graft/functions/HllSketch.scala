package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog-style distinct-count sketch as a custom
  * [[TypedImperativeAggregate]] — the scale form of COUNT(DISTINCT): one
  * narrow pass, a KB-sized buffer per partial, and a merge that is an
  * elementwise max, where exact distinct shuffles the full key set.
  *
  * Deliberately DETERMINISTIC and engine-portable: the input is a 60-bit
  * md5-derived hash (the same family as the SimHash/winnowing ops), the
  * top [[HllSketch.B]] bits pick a register, and the register keeps the
  * max rank (leading-zero count + 1) of the remaining bits. The result is
  * the 1024 registers as a fixed-width hex string — integers, not floats,
  * so the DuckDB oracle recomputes it byte-for-byte; the cardinality
  * ESTIMATE (a float) is derived from the string by the caller
  * ([[HllSketch.estimate]]) and accuracy-tested in the spec (~3% at m=1024).
  *
  * Spark's builtin approx_count_distinct is the production default; this
  * exists because its sketch is engine-private (not independently
  * checkable) and to exercise the custom-aggregate surface (SURVEY §2.11).
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch.{B, HashBits, M}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val reg = ((h >>> (HashBits - B)) & (M - 1)).toInt
      val rest = h & ((1L << (HashBits - B)) - 1)
      val rank =
        if (rest == 0L) HashBits - B + 1
        else HashBits - B - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > buf(reg)) buf(reg) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    UTF8String.fromString(HllSketch.toHex(buf))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketch =
    copy(child = newChild)
}

object HllSketch {
  /** Register-index bits: m = 2^B = 1024 registers (~3.2% standard error). */
  val B = 10
  val M: Int = 1 << B
  /** Input hash width (md5-prefix hash, same family as SimHash). */
  val HashBits = 60

  def toHex(buf: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(buf.length * 2)
    buf.foreach(b => sb.append(f"$b%02X"))
    sb.toString
  }

  /** HLL estimate from the hex register string: alpha_m * m^2 / sum(2^-M_j)
    * with the standard small-range correction (linear counting over empty
    * registers when raw <= 2.5m — without it, cardinalities far below m are
    * grossly overestimated).
    */
  def estimate(hex: String): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16)
      if (r == 0) zeros += 1
      sum += math.pow(2.0, -r)
      i += 1
    }
    val raw = alpha * M.toDouble * M.toDouble / sum
    if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
    else raw
  }

  /** Column API surface. */
  def hll_sketch(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      HllSketch(GraftColumnBridge.expression(c)).toAggregateExpression())
  }
}
