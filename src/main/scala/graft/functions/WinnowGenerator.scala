package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator: winnowing fingerprints (Schleimer et al.) of a
  * string in ONE per-row pass — hash every character k-gram with the
  * portable md5-prefix family, keep the minimum of every sliding
  * window of w hashes, emit the distinct minima sorted.
  *
  * Arithmetic is identical to the composed pipeline it replaces
  * (`text_winnow_fingerprint`'s posexplode → windowed-min → distinct:
  * `conv(substring(md5(substr(text, i, k)), 1, 8), 16, 10)`), so the
  * DuckDB oracle is unchanged — TextAnalysisSpec-level equality is
  * pinned in FunctionsSpec. What changes is the plan: the composed
  * form explodes 1.45M (pos, hash) rows at sf0.1 through a doc_id
  * exchange + sort + WindowExec + a distinct exchange; this generator
  * needs ZERO shuffles before the final presentation sort — the
  * fingerprint set materializes inside the scan projection.
  *
  * Edge rule (same as the composed form): a doc shorter than k+w-1
  * chars still yields max(len-k+1, 1) hashes and, when there are
  * fewer than w hashes, one truncated window at pos 0.
  */
case class WinnowGenerator(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow: k and w must be >= 1, got k=$k w=$w")

  override def elementSchema: StructType =
    StructType(Seq(StructField("fp", LongType, nullable = false)))

  override def prettyName: String = "winnow_fingerprints"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val text = raw.asInstanceOf[UTF8String].toString
      val md = MessageDigest.getInstance("MD5")
      // iterate CODE POINTS, not UTF-16 code units: the composed form
      // this claims parity with (Spark substr → UTF8String.substringSQL)
      // and the DuckDB oracle both count characters as code points, so a
      // code-unit walk would silently break parity on non-BMP text
      // (emoji, CJK extensions — surrogate pairs are 2 units, 1 point)
      val cps = text.codePoints().toArray
      val nHashes = math.max(cps.length - k + 1, 1)
      val h = new Array[Long](nHashes)
      var i = 0
      while (i < nHashes) {
        // substr(text, i+1, k) semantics: up to k chars, short tail ok
        val gram = new String(cps, i, math.min(k, cps.length - i))
        md.reset()
        val digest = md.digest(gram.getBytes(StandardCharsets.UTF_8))
        // first 8 hex chars == top 4 bytes, read big-endian as unsigned
        h(i) = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
          ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
        i += 1
      }
      val fps = new java.util.TreeSet[java.lang.Long]()
      val lastPos = math.max(nHashes - w, 0)
      var p = 0
      while (p <= lastPos) {
        var m = h(p)
        var j = p + 1
        val end = math.min(p + w, nHashes)
        while (j < end) { if (h(j) < m) m = h(j); j += 1 }
        fps.add(m)
        p += 1
      }
      val out = new Array[InternalRow](fps.size)
      val it = fps.iterator()
      var r = 0
      while (it.hasNext) { out(r) = InternalRow(it.next().longValue()); r += 1 }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowGenerator =
    copy(child = newChild)
}
