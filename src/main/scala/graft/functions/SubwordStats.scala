package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: greedy longest-match ("maximal munch") subword
  * segmentation stats of a space-tokenized string against a fixed
  * vocabulary, in ONE per-row pass.
  *
  * For each whitespace word, repeatedly take the LONGEST vocabulary
  * piece (≤ `maxPieceLen` chars) starting at the cursor; when no
  * piece matches, one character is consumed as UNK (counted as one
  * piece AND one unk). Returns struct(n_pieces, n_unk). This is the
  * BPE/WordPiece serving shape without the continuation-marker
  * distinction — the segmentation is deterministic given the vocab,
  * so the declared query is reproducible run over run even though
  * greedy matching is not SQL-expressible (rows-only check; the
  * semantics are pinned piece-by-piece in FunctionsSpec).
  *
  * Scale shape: the vocabulary rides into the generated code as ONE
  * reference object (a shared HashSet, same bounded-driver-artifact
  * class as the IVF centroid table — NOT a per-row literal), the
  * match loop is O(len·maxPieceLen) hash probes per word, and the
  * whole thing stays inside whole-stage codegen: encoding is a
  * map-only scan projection, no shuffle, no UDF serialization.
  */
case class SubwordStats(child: Expression, vocab: Seq[String], maxPieceLen: Int)
  extends UnaryExpression {

  require(maxPieceLen >= 1, s"subword_stats: maxPieceLen must be >= 1, got $maxPieceLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", LongType, nullable = false),
    StructField("n_unk", LongType, nullable = false)))

  override def prettyName: String = "subword_stats"

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    SubwordStats.compute(input.asInstanceOf[UTF8String], vocabSet, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val setRef = ctx.addReferenceObj("subwordVocab", vocabSet, "java.util.HashSet")
      s"${ev.value} = graft.functions.SubwordStats.compute($t, $setRef, $maxPieceLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordStats {

  /** One-pass greedy segmentation; static so generated code calls it
    * directly and the row stays inside whole-stage codegen. */
  def compute(text: UTF8String, vocab: java.util.HashSet[String], maxPieceLen: Int): InternalRow = {
    var pieces = 0L
    var unk = 0L
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var pos = 0
      while (pos < word.length) {
        var l = math.min(maxPieceLen, word.length - pos)
        var matched = 0
        while (l >= 1 && matched == 0) {
          if (vocab.contains(word.substring(pos, pos + l))) matched = l
          else l -= 1
        }
        if (matched > 0) { pieces += 1; pos += matched }
        else { pieces += 1; unk += 1; pos += 1 }
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](pieces, unk))
  }
}
