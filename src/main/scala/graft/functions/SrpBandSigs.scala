package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: ALL signed-random-projection band
  * signatures of an `array<double>` vector in one pass.
  *
  * `weights` holds one hyperplane row per projection (bands·bits rows,
  * each `dim` doubles — driver-precomputed constants of the md5 hash
  * family, see `graft.llm.Similarity.srpWeightValue`); the result is
  * `bands` longs, band b's bit j = sign of <plane_{b·bits+j}, v>.
  *
  * Why not the composed `zip_with`+`aggregate` fold per plane (kept in
  * Similarity as the verified `*Hof` baseline)? Higher-order functions
  * are `CodegenFallback` — 32 banded planes cost 32 interpreted lambda
  * walks (with boxing) per row, and they sat on the map side of every
  * banded-ANN query once `embed_ann_join` joined the bench headline.
  * This expression emits one tight primitive loop inside whole-stage
  * codegen and is BIT-IDENTICAL to the fold: same left-to-right
  * accumulation order per plane, same `>= 0` sign rule (ties → 1, NaN
  * → 0), so the DuckDB oracle replay of the same arithmetic still
  * hash-matches (FunctionsSpec pins native == HOF on the real corpus).
  *
  * Null semantics mirror the composed form: null input → null; a null
  * ELEMENT poisons every projection (`x * w` → null → `when(null >= 0)`
  * falls to otherwise(0)), so every signature is 0. A vector whose
  * length differs from the plane dimension is treated the same way:
  * `zip_with` pads the shorter side with nulls, which poisons the fold
  * exactly like a null element, so the native path emits all-zero
  * signatures rather than a truncated partial dot product (ADVICE r7 —
  * the earlier `min(n, dim)` loop silently diverged from the verified
  * HOF semantics on malformed embeddings).
  */
case class SrpBandSigs(
    child: Expression, weights: Seq[Seq[Double]], bits: Int)
  extends UnaryExpression {

  require(bits >= 1 && weights.nonEmpty && weights.size % bits == 0,
    s"srp_band_sigs: ${weights.size} weight rows do not tile $bits-bit bands")
  private val bands: Int = weights.size / bits

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_sigs"

  // row-major [plane][dim] primitive matrix, built once per task via
  // the serialized expression (and once per codegen'd class reference)
  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray
  private val dim: Int = weights.head.size

  private def compute(arr: ArrayData): Array[Long] = {
    val sigs = new Array[Long](bands)
    val n = arr.numElements()
    var poisoned = n != dim // length mismatch ≡ null padding in zip_with
    var d = 0
    while (d < n && !poisoned) { poisoned = arr.isNullAt(d); d += 1 }
    if (!poisoned) {
      var b = 0
      while (b < bands) {
        var sig = 0L
        var j = 0
        while (j < bits) {
          val row = w(b * bits + j)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += arr.getDouble(i) * row(i); i += 1 }
          if (acc >= 0) sig |= (1L << j)
          j += 1
        }
        sigs(b) = sig
        b += 1
      }
    }
    sigs
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val wRef = ctx.addReferenceObj("srpWeights", w, "double[][]")
      val sigs = ctx.freshName("sigs")
      val hasNull = ctx.freshName("hasNull")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val row = ctx.freshName("row")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val d = ctx.freshName("d")
      s"""
         |long[] $sigs = new long[$bands];
         |int $n = $a.numElements();
         |boolean $hasNull = $n != $dim;
         |for (int $d = 0; $d < $n && !$hasNull; $d++) { $hasNull = $a.isNullAt($d); }
         |if (!$hasNull) {
         |  for (int $b = 0; $b < $bands; $b++) {
         |    long $sig = 0L;
         |    for (int $j = 0; $j < $bits; $j++) {
         |      double[] $row = $wRef[$b * $bits + $j];
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $n; $i++) { $acc += $a.getDouble($i) * $row[$i]; }
         |      if ($acc >= 0) { $sig |= (1L << $j); }
         |    }
         |    $sigs[$b] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
