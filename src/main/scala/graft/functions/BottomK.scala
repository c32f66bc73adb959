package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import scala.collection.mutable

/** Bottom-k DISTINCT longs as a `TypedImperativeAggregate` — the KMV
  * cardinality sketch as a first-class aggregate: state is a sorted
  * set of ≤ k values (O(k) per group, REGARDLESS of input size),
  * partial buffers merge by union-and-trim (KMV's lossless merge:
  * bottom-k of unioned bottom-k sets = bottom-k of the union), and
  * the result is the ascending sketch array.
  *
  * The declarative twin in `queries/Sketches.kmvSketch` (row_number ≤ k
  * via WindowGroupLimit) produces the same frame batch-side —
  * FunctionsSpec pins element-for-element equality. This form exists
  * for the two places the window can't go: STREAMING aggregation
  * (complete/update mode keeps exactly these k longs per group in the
  * state store, the bounded-cardinality answer an exact streaming
  * distinct can't give) and single-pass multi-aggregate plans.
  */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 1, s"bottom_k: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k requires a bigint argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf += v; buf -= buf.last }
  }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = mutable.TreeSet.empty[Long]
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bottom_k"
}
