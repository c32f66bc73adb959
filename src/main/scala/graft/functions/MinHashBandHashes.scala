package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the complete banded-minhash LSH keys of
  * a document in ONE pass over its text — `bands` md5-hex band hashes
  * computed from k = bands·rowsPerBand affine minhash signatures over
  * the document's sliding `n`-token grams (n = 1 ⇒ token sets).
  *
  * Bit-identical to the composed pipeline it fuses (kept as the
  * verified baseline in Dedup): per element, base hash h = first 8 hex
  * chars of md5(seed + gram) as a BIGINT; signature i = min over
  * elements of (a_i·h + b_i) mod prime; band b's key = md5 of the
  * comma-joined DECIMAL strings of its rowsPerBand signatures (the
  * exact bytes `md5(concat_ws(",", mh…))` hashes — longs render in
  * base 10 identically in Scala, Spark, and DuckDB, so the oracle
  * replay is unchanged). Min is idempotent, so hashing the gram
  * MULTISET equals the oracle's list_distinct form.
  *
  * Why fuse this far: with the signatures AND the banding inside one
  * scan-projection expression, the whole LSH key derivation is
  * map-only — no gram rows, no exploded-hash exchange, no
  * doc_id-keyed aggregate (the last shuffle the minhash tiers paid;
  * simhash and SRP signatures went map-only the same round). The
  * single array output is consumed by ONE posexplode, so nothing
  * tempts CollapseProject into duplicating the computation.
  *
  * Null / shorter-than-n text → null (callers filter — the composed
  * form's explode dropped those docs the same way).
  */
case class MinHashBandHashes(
    child: Expression, n: Int, seed: String,
    as: Seq[Long], bs: Seq[Long], prime: Long, rowsPerBand: Int)
  extends UnaryExpression {

  require(n >= 1, s"minhash_band_hashes: n must be >= 1, got $n")
  require(rowsPerBand >= 1 && as.size == bs.size && as.size % rowsPerBand == 0,
    s"minhash_band_hashes: ${as.size} affine constants do not tile $rowsPerBand-row bands")
  private val k: Int = as.size
  private val bands: Int = k / rowsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_hashes"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashBandHashes.compute(
      input.asInstanceOf[UTF8String], n, seed, aArr, bArr, prime, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedRef = ctx.addReferenceObj("mhSeed", seed, "java.lang.String")
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashBandHashes.compute(
         |  $c, $n, $seedRef, $aRef, $bRef, ${prime}L, $rowsPerBand);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandHashes {

  private val hexChars = "0123456789abcdef".toCharArray

  /** One-pass banded key derivation; static so generated code calls it
    * directly. Returns null when the text has fewer than n tokens. */
  def compute(
      text: UTF8String, n: Int, seed: String,
      as: Array[Long], bs: Array[Long], prime: Long,
      rowsPerBand: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return null
    val k = as.length
    val md = MessageDigest.getInstance("MD5")
    val seedBytes = seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val space = Array[Byte](' ')
    val tokBytes = new Array[Array[Byte]](toks.length)
    var t = 0
    while (t < toks.length) {
      tokBytes(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      t += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - n) {
      md.reset()
      md.update(seedBytes)
      var j = 0
      while (j < n) {
        if (j > 0) md.update(space)
        md.update(tokBytes(i + j))
        j += 1
      }
      val digest = md.digest()
      // first 8 hex chars as a long — identical to
      // conv(substring(md5(seed || e), 1, 8), 16, 10)
      var h = 0L
      var c = 0
      while (c < 8) {
        val nibble =
          if (c % 2 == 0) (digest(c / 2) >> 4) & 0xf else digest(c / 2) & 0xf
        h = (h << 4) | nibble
        c += 1
      }
      var s = 0
      while (s < k) {
        val v = (as(s) * h + bs(s)) % prime
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    // band hash = md5 of the comma-joined base-10 signature strings —
    // the exact bytes md5(concat_ws(",", …)) hashes
    val bands = k / rowsPerBand
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rowsPerBand) {
        if (r > 0) sb.append(',')
        sb.append(mins(b * rowsPerBand + r))
        r += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var x = 0
      while (x < 16) {
        hex(2 * x) = hexChars((digest(x) >> 4) & 0xf)
        hex(2 * x + 1) = hexChars(digest(x) & 0xf)
        x += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
