package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the whole `bits`-bit SimHash majority
  * signature of a (distinct) token array in ONE per-row pass.
  *
  * Replaces the explode → md5 → `bits`+1-column partial+final
  * aggregate pipeline (`Dedup.simhashed64Agg`, kept as the verified
  * baseline): same per-token hash family (md5 of seed+token, first
  * `hexLen` hex chars as a BIGINT — bit-identical to
  * `conv(substring(md5(concat(seed, t)), 1, hexLen), 16, 10)`), same
  * majority rule (bit k set iff 2·ones ≥ n, ties → 1), same n
  * (EVERY array element counts, including a null element, which
  * contributes no bits — mirroring count(*) vs null-skipping sum in
  * the aggregate form). The signature stage becomes MAP-ONLY: no
  * exploded-token exchange, no wide aggregate state; at 100 TB the
  * signatures materialize inside the scan projection exactly like the
  * winnow fingerprints.
  *
  * Callers pass the ALREADY-distinct array (`array_distinct(split …)`)
  * — the expression hashes elements as given. Null array → null (the
  * caller filters, mirroring "explode of null emits no rows").
  */
case class SimHashSig(child: Expression, seed: String, bits: Int, hexLen: Int)
  extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"simhash_sig: bits must be in [1,63], got $bits")
  require(hexLen >= 1 && hexLen <= 15, s"simhash_sig: hexLen must be in [1,15], got $hexLen")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData], seed, bits, hexLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedRef = ctx.addReferenceObj("simhashSeed", seed, "java.lang.String")
      s"${ev.value} = graft.functions.SimHashSig.compute($a, $seedRef, $bits, $hexLen);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {

  /** One-pass signature; static so generated code calls it directly
    * (stays inside whole-stage codegen — one call per ROW, the md5
    * work per token is the irreducible data-hashing cost either way). */
  def compute(arr: ArrayData, seed: String, bits: Int, hexLen: Int): Long = {
    val md = MessageDigest.getInstance("MD5")
    val seedBytes = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = arr.numElements()
    val ones = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(seedBytes)
        md.update(arr.getUTF8String(i).getBytes)
        val digest = md.digest()
        // first hexLen hex chars of the digest as a long — identical to
        // conv(substring(md5(…), 1, hexLen), 16, 10)
        var h = 0L
        var c = 0
        while (c < hexLen) {
          val nibble =
            if (c % 2 == 0) (digest(c / 2) >> 4) & 0xf else digest(c / 2) & 0xf
          h = (h << 4) | nibble
          c += 1
        }
        var k = 0
        while (k < bits) {
          ones(k) += ((h >> k) & 1L).toInt
          k += 1
        }
      }
      // a null element still counts toward n (the aggregate form's
      // count(*) counts its row while sum() skips its null bits)
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (2L * ones(k) >= n) sig |= (1L << k) // ties → 1
      k += 1
    }
    sig
  }
}
