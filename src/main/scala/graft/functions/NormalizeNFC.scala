package graft.functions

import java.text.{Normalizer => JNormalizer}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column (canonical composition — `e` + COMBINING ACUTE → `é`).
  *
  * Spark ships no normalization built-in, and a Scala UDF would box
  * every row and fall out of whole-stage codegen. This expression
  * stays inside the generated scan projection: `doGenCode` emits one
  * static call, and the common case (already-NFC text — every byte of
  * a clean corpus after the first pass) is a zero-copy fast path via
  * `Normalizer.isNormalized`, which for ASCII is a single scan with no
  * allocation. Corpus normalization is the canonical first step of an
  * LLM ingest pipeline (dedup keys and n-gram hashes are only stable
  * once the text is in one canonical form); the reference never needed
  * it because its telemetry is numeric, so this extends the engine
  * surface the same way the dedup/similarity tier does.
  *
  * Semantics match `java.text.Normalizer.normalize(s, NFC)` exactly —
  * the same definition DuckDB's `nfc_normalize` implements (both
  * follow UAX #15), which is what lets the declared query put this
  * under the cross-engine oracle. Null input → null.
  */
case class NormalizeNFC(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNFC.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNFC.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeNFC {
  /** Static entry point shared by interpreted eval and generated code
    * (the companion's static forwarder makes the Java-style call in
    * `doGenCode` resolve). Two fast paths: pure-ASCII input (closed
    * under NFC — one byte scan, zero allocation) and already-NFC
    * input (returned as-is, no re-encode). */
  def nfc(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) { ascii = s.getByte(i) >= 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (JNormalizer.isNormalized(str, JNormalizer.Form.NFC)) s
    else UTF8String.fromString(JNormalizer.normalize(str, JNormalizer.Form.NFC))
  }
}
