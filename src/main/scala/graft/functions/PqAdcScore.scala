package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization ADC (asymmetric
  * distance computation) score of a PQ code word against a probe's
  * lookup table in one codegen'd pass.
  *
  * `lut` is the probe-side table, flat row-major `[sub][code]` —
  * `lut(s·k + c)` = <probe subvector s, codebook centroid c of
  * subspace s> (driver-computed per probe from the m·k persisted
  * codebook rows; Jégou/Douze/Schmid TPAMI'11 §IV.A). The score of a
  * corpus vector encoded as `codes` (m small ints) is the sum of its
  * m table hits — an O(m) approximation of the O(d) inner product
  * that never touches the original vector.
  *
  * Why native: the composed `transform(codes, (c, s) →
  * element_at(lut, s·k + c + 1))` + `aggregate` fold is
  * `CodegenFallback` — two interpreted lambda walks with boxing per
  * scanned row on what is THE hot loop of a PQ scan (at scale: every
  * row of the corpus per query). This emits one flat
  * lookup-accumulate loop inside whole-stage codegen and is
  * bit-identical to the fold (same left-to-right accumulation from
  * the same 0.0 seed — FunctionsSpec pins native == HOF on the real
  * corpus).
  *
  * Null semantics: null input → null, and a null element poisons the
  * fold to null — exactly like the composed form (`try_element_at`
  * nulls the hit, the sum propagates it). On STRUCTURALLY invalid
  * codes the native path is deliberately stricter than the fold: a
  * code outside [0, k) or a code count ≠ m scores null, where the
  * fold would return a plausible-but-wrong number (`try_element_at`
  * indexes from the END on negatives; a short array just sums fewer
  * terms) — the SrpBandSigs ADVICE-r7 lesson applied from the start.
  * The PQ builder can only emit m in-range codes or null, so the two
  * forms are bit-identical on every real index row (FunctionsSpec).
  */
case class PqAdcScore(child: Expression, lut: Seq[Double], k: Int)
  extends UnaryExpression {

  require(k >= 1 && lut.nonEmpty && lut.size % k == 0,
    s"pq_adc_score: LUT of ${lut.size} entries does not tile k=$k codes")
  private val m: Int = lut.size / k

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val table: Array[Double] = lut.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != m) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (arr.isNullAt(s)) return null
      val c = arr.getInt(s)
      if (c < 0 || c >= k) return null
      acc += table(s * k + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val lutRef = ctx.addReferenceObj("pqLut", table, "double[]")
      val acc = ctx.freshName("acc")
      val poisoned = ctx.freshName("poisoned")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |double $acc = 0.0;
         |boolean $poisoned = $a.numElements() != $m;
         |for (int $s = 0; $s < $m && !$poisoned; $s++) {
         |  if ($a.isNullAt($s)) { $poisoned = true; } else {
         |    int $c = $a.getInt($s);
         |    if ($c < 0 || $c >= $k) { $poisoned = true; }
         |    else { $acc += $lutRef[$s * $k + $c]; }
         |  }
         |}
         |${ev.isNull} = $poisoned;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
