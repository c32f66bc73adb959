package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the CONTINUOUS random projection of an
  * `array<double>` vector onto every hyperplane row of `weights` in one
  * codegen'd pass — the Johnson–Lindenstrauss reduction twin of
  * [[SrpBandSigs]] (same driver-precomputed md5 plane family, the raw
  * dot products instead of their sign bits).
  *
  * Replaces `RpDims` separate `zip_with`+`aggregate` folds per row
  * (`Similarity.rpProjectHof`, kept as the verified baseline) — HOFs
  * are `CodegenFallback`, so the composed form paid 16 interpreted
  * lambda walks with boxing per row on what is a pure map-side ingest
  * projection at scale. Bit-identical to the fold: same left-to-right
  * accumulation order from the same 0.0 seed, so the DuckDB oracle of
  * `embed_rp_preserve` (which replays the identical arithmetic in SQL)
  * still hash-matches.
  *
  * Null semantics mirror the composed form element-wise: null input →
  * null; a null ELEMENT or a length≠dim vector poisons every fold
  * (`zip_with` pads with null), so the result is an array of
  * `weights.size` NULL entries — not a truncated partial projection
  * (the SrpBandSigs ADVICE-r7 lesson applied from the start here).
  */
case class RpProject(child: Expression, weights: Seq[Seq[Double]])
  extends UnaryExpression {

  require(weights.nonEmpty && weights.forall(_.size == weights.head.size),
    "rp_project: weight rows must be non-empty and rectangular")
  private val planes: Int = weights.size
  private val dim: Int = weights.head.size

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "rp_project"

  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray

  private def compute(arr: ArrayData): Array[Any] = {
    val out = new Array[Any](planes)
    val n = arr.numElements()
    var poisoned = n != dim
    var d = 0
    while (d < n && !poisoned) { poisoned = arr.isNullAt(d); d += 1 }
    if (!poisoned) {
      var p = 0
      while (p < planes) {
        val row = w(p)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += arr.getDouble(i) * row(i); i += 1 }
        out(p) = acc
        p += 1
      }
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("rpWeights", w, "double[][]")
      val out = ctx.freshName("out")
      val poisoned = ctx.freshName("poisoned")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |Object[] $out = new Object[$planes];
         |int $n = $a.numElements();
         |boolean $poisoned = $n != $dim;
         |for (int $d = 0; $d < $n && !$poisoned; $d++) { $poisoned = $a.isNullAt($d); }
         |if (!$poisoned) {
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double[] $row = $wRef[$p];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $row[$i]; }
         |    $out[$p] = java.lang.Double.valueOf($acc);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
