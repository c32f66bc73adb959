package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Generator (UDTF): sliding `n`-token grams of a
  * space-tokenized string as (pos, gram) rows — the row-generating
  * extension point, completing graft's extension matrix (scalar
  * `Expression` with codegen → CosineSimilarity; fused binary →
  * JaccardSimilarity; `TypedImperativeAggregate` → ExactQuantile;
  * whole-operator LogicalPlan/Strategy/Exec + optimizer Rule →
  * AsOfJoinNative; and now a `Generator`).
  *
  * Why it exists (and not only as API completeness): the composed
  * built-ins form of n-gram extraction either (a) references the
  * token array inside a HOF lambda — the O(len²) plan-collapse trap
  * documented on text_winnow_fingerprint — or (b) goes through
  * posexplode + an n-row window (`Curation.ngramRows`), which costs a
  * full hash exchange on doc_id plus a sort before any gram exists.
  * This generator emits grams INSIDE the scan projection: zero
  * shuffles, one pass over the tokens, each token substring
  * materialized once (OperatorsSpec measures the difference and pins
  * row-for-row equality with the window form).
  *
  * Semantics: null / shorter-than-n input → no rows; `pos` is the
  * 0-based index of the gram's first token. Generators are evaluated
  * per-row outside whole-stage codegen (same as Spark's own explode
  * family), hence CodegenFallback.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngrams: n must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def prettyName: String = "ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val toks = raw.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Nil
      else {
        // reuse one StringBuilder; each gram is built from its n tokens
        // exactly once — O(total output chars), no re-tokenization
        val out = new Array[InternalRow](toks.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= toks.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = InternalRow(i, UTF8String.fromString(sb.toString))
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}
