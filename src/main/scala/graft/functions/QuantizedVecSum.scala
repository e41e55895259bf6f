package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Element-wise QUANTIZED vector sum aggregate over an `array<float>`
 * embedding column — the building block of mean-pooling and centroid
 * computation (`mean = sum_q / (scale · n)`): each component maps to
 * `round(x · scale)` ([[QuantizedDot]]'s half-away-from-zero rule) and
 * accumulates in exact Long arithmetic, so the aggregate is
 * order-independent and bit-identical on any engine/partitioning — a
 * float vector sum changes with summation order and cannot be verified
 * across engines.
 *
 * A custom Catalyst aggregate (`TypedImperativeAggregate`), not a UDAF:
 * the buffer is a primitive `long[]` updated in place, it participates
 * in map-side partial aggregation (`update` per row, `merge` per
 * partial — the shuffle carries one dim-length array per (partition,
 * group), never the rows), and serialization is the raw 8-byte words.
 *
 * NULL/empty vectors are skipped; a group with none contributes NULL.
 * Ragged dimensions inside one group fail loud — silently truncating or
 * padding would corrupt the centroid.
 */
case class QuantizedVecSum(child: Expression, scale: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(scale >= 1, "quantization scale must be >= 1")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_vec_sum"

  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return buffer
    val b = if (buffer == null) new Array[Long](n) else buffer
    if (b.length != n) {
      throw new IllegalArgumentException(
        s"$prettyName: ragged vector dims in one group (${b.length} vs $n)")
    }
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) b(i) += QuantizedDot.q(arr.getFloat(i), scale)
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    if (b1 == null) return b2
    if (b2 == null) return b1
    if (b1.length != b2.length) {
      throw new IllegalArgumentException(
        s"$prettyName: ragged vector dims across partials (${b1.length} vs ${b2.length})")
    }
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    if (bytes.isEmpty) return null
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantizedVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantizedVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantizedVecSum =
    copy(child = newChildren.head)
}
