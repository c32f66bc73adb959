package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native HLL leading-zero rank: ρ = `maxRho` − bitlength(w) for
  * w > 0, `maxRho` for w = 0 — one `Long.numberOfLeadingZeros`
  * intrinsic (an LZCNT instruction after JIT) inside whole-stage
  * codegen.
  *
  * Why native: the composed form — `maxRho − length(bin(w))` — is
  * value-identical (bitlength(w) = 64 − nlz(w); SketchesSpec pins the
  * equivalence on real hashes) but allocates a binary STRING per row
  * in the register-build scan, the one data-sized stage of the HLL
  * build. The DuckDB oracle keeps the bin-length form — the point of
  * this expression is to compute the same integer without the
  * allocation, not to change the pinned arithmetic.
  *
  * Null propagates; negative inputs are rejected at type-check time
  * conceptually but guarded at runtime by the hash construction
  * (md5-prefix hashes are non-negative) — a negative w would have
  * nlz = 0 and return `maxRho` − 64, never silently right-looking. */
case class HllRho(child: Expression, maxRho: Int)
  extends UnaryExpression {

  require(maxRho >= 1 && maxRho <= 64, "hll_rho: maxRho must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hll_rho"

  override def nullSafeEval(input: Any): Any = {
    val w = input.asInstanceOf[Long]
    if (w == 0L) maxRho
    else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w =>
      s"($w == 0L) ? $maxRho : $maxRho - (64 - java.lang.Long.numberOfLeadingZeros($w))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
