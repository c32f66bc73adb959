package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** One-pass EXACT quantile as a `TypedImperativeAggregate` — the
  * custom-aggregate case SURVEY §4.4 flags as justified: recall-driven
  * threshold selection (reference
  * /root/reference/scripts/05_01_model_training_xgboost_oom_fix.py:224-237
  * collects every positive score to the driver and sorts in Python).
  *
  * This keeps the scores distributed: each partition accumulates its
  * values in a primitive-backed buffer, partial buffers merge on the
  * reduce side, and only the final aggregate sorts once. Memory is
  * O(values) on the MERGING EXECUTOR, not the driver — fit for the
  * rare-positive regime this selects thresholds in (the whole premise
  * is positives ≪ data). For dense inputs use approxQuantile's GK
  * sketch instead; this expression is the exact-path complement.
  *
  * `quantile` φ ∈ [0,1]: returns the ascending-sort element at 1-based
  * rank ⌈φ·n⌉ (clamped) — the same convention as
  * `approxQuantile(…, relativeError = 0.0)`, asserted equal in
  * FunctionsSpec. The reference's "score at index ⌊n·recall⌋ of the
  * descending sort" maps to φ = 1 − recall.
  */
case class ExactQuantile(
    child: Expression,
    quantile: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exact_quantile requires a double argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): ArrayBuffer[Double] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Double], input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double]
    buf
  }

  override def merge(buf: ArrayBuffer[Double], other: ArrayBuffer[Double]): ArrayBuffer[Double] =
    buf ++= other

  override def eval(buf: ArrayBuffer[Double]): Any =
    if (buf.isEmpty) null
    else {
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val idx = math.min(sorted.length - 1,
        math.max(0, math.ceil(quantile * sorted.length).toInt - 1))
      sorted(idx)
    }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Double](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getDouble
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "exact_quantile"
}
