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
    * directly and the row stays inside whole-stage codegen.
    *
    * Iterates by Unicode CODE POINTS, not UTF-16 units (ADVICE r8):
    * the vocabulary is learned via Spark SQL `substring` — code-point
    * semantics — so piece lengths here must count code points too, and
    * the UNK advance must consume a whole code point (a char-indexed
    * advance would split a surrogate pair and probe half-characters
    * against the vocab). For BMP text the two indexings coincide, so
    * ASCII behavior is unchanged. */
  def compute(text: UTF8String, vocab: java.util.HashSet[String], maxPieceLen: Int): InternalRow = {
    var pieces = 0L
    var unk = 0L
    val words = text.toString.split(" ", -1)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val nCp = word.codePointCount(0, word.length)
      var pos = 0   // UTF-16 char index of the cursor
      var cp = 0    // code-point index of the cursor
      while (cp < nCp) {
        var l = math.min(maxPieceLen, nCp - cp) // candidate length in code points
        var matchedChars = 0
        while (l >= 1 && matchedChars == 0) {
          val end = word.offsetByCodePoints(pos, l)
          if (vocab.contains(word.substring(pos, end))) matchedChars = end - pos
          else l -= 1
        }
        if (matchedChars > 0) { pieces += 1; pos += matchedChars; cp += l }
        else {
          pieces += 1; unk += 1
          pos = word.offsetByCodePoints(pos, 1); cp += 1
        }
      }
      w += 1
    }
    new GenericInternalRow(Array[Any](pieces, unk))
  }
}
