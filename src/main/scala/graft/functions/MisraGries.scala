package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Misra–Gries heavy-hitter CANDIDATES as a
  * `TypedImperativeAggregate`: bounded state of at most `k` counters
  * per buffer regardless of stream length or vocabulary size — the
  * sketch that makes "frequent tokens over 100 TB" one aggregate pass
  * instead of a full-vocabulary groupBy.
  *
  * Classic guarantees (Misra & Gries 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS 2012): after updates and
  * arbitrary-order merges, every item with true frequency > n/(k+1)
  * is present in the summary. The summary itself is merge-order-
  * dependent (NOT deterministic) — so the engine's public surface
  * (`Curation.frequentTokens`, `text_frequent_tokens`) uses it only
  * as a candidate GENERATOR and re-counts candidates exactly; the
  * final `freq·k > n` answer is deterministic and DuckDB-oracle-
  * checkable. PropertySpec pins the superset guarantee under random
  * streams and repartitionings.
  *
  * Merge: add counts, then if more than k counters survive, subtract
  * the (k+1)-th largest count from all and drop the non-positive
  * remainder (the mergeable-summaries reduction).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k =>
          // copy: the incoming UTF8String may be backed by reused row memory
          buf.update(key.clone(), 1L)
        case None =>
          // decrement-all step: every counter pays one; drop exhausted.
          // Keys are SNAPSHOTTED first: updating a mutable.HashMap while
          // iterating its keysIterator is formally undefined even for
          // value-only updates (ADVICE r6).
          val keys = buf.keys.toArray
          var i = 0
          while (i < keys.length) {
            val kk = keys(i)
            val nc = buf(kk) - 1
            if (nc <= 0) buf.remove(kk) else buf.update(kk, nc)
            i += 1
          }
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (kk, c) =>
      buf.update(kk, buf.getOrElse(kk, 0L) + c)
    }
    if (buf.size > k) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      // snapshot keys before mutating (same rule as update's decrement)
      val keys = buf.keys.toArray
      var i = 0
      while (i < keys.length) {
        val kk = keys(i)
        val nc = buf(kk) - cut
        if (nc <= 0) buf.remove(kk) else buf.update(kk, nc)
        i += 1
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    // sorted for presentation stability; the SET is what downstream uses
    new GenericArrayData(buf.keysIterator.toArray.sortBy(_.toString).map(identity[Any]))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var size = 4
    buf.foreach { case (kk, _) => size += 4 + kk.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    buf.foreach { case (kk, c) =>
      val bytes = kk.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.update(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}
