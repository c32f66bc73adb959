package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator: consecutive NON-overlapping `n`-token chunks of
  * a space-tokenized string as (chunk, chunk_text) rows — the strided
  * sibling of `NGramGenerator`, including the partial tail chunk.
  *
  * Why: chunking via built-ins needs posexplode + groupBy(doc, pos
  * div n) + an order-restoring array_sort(collect_list(struct)) —
  * one full exchange and a per-chunk sort before any chunk text
  * exists (`Curation.boilerplateChunksComposed`, kept as the parity
  * reference). This generator emits the chunks inside the scan
  * projection: zero shuffles, one token pass, each chunk string
  * built exactly once.
  *
  * Semantics (byte-identical to the composed form and the DuckDB
  * oracle): tokens are `split(text, " ", -1)` — empty tokens
  * preserved — so an empty text yields one chunk with empty text;
  * `chunk` is pos div n; the tail chunk may carry fewer than n
  * tokens. Null input → no rows.
  */
case class ChunkGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"chunks: n must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def prettyName: String = "chunks"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val toks = raw.asInstanceOf[UTF8String].toString.split(" ", -1)
      val nChunks = (toks.length + n - 1) / n
      val out = new Array[InternalRow](nChunks)
      val sb = new java.lang.StringBuilder
      var c = 0
      while (c < nChunks) {
        sb.setLength(0)
        var j = c * n
        val end = math.min(j + n, toks.length)
        while (j < end) {
          if (j > c * n) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out(c) = InternalRow(c, UTF8String.fromString(sb.toString))
        c += 1
      }
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkGenerator =
    copy(child = newChild)
}
