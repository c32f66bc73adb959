package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator: sliding `n`-token grams of a space-tokenized
  * string as (pos, gram_h) rows, where gram_h is the first `hexLen`
  * hex chars of md5(gram) as a BIGINT — exactly
  * `conv(substring(md5(gram), 1, hexLen), 16, 10)` of the gram string
  * `NGramGenerator` would emit (FunctionsSpec pins row-for-row
  * equality with that composed form).
  *
  * Why fuse the hash into the generator: the decontamination pipeline
  * never uses the gram TEXT — every downstream stage (distinct,
  * semi/anti joins, the probe join) runs on the 60-bit key. Emitting
  * the hash directly skips materializing ~60-char gram strings into
  * row buffers only for the md5 expression to re-read them: the
  * digest is updated incrementally from the token bytes (one UTF-8
  * pass, no StringBuilder, no UTF8String allocation per gram). The
  * md5-over-data cost itself is the deliberate cross-engine
  * portability tax (see PLANS.md) and is unchanged.
  *
  * Semantics: null / shorter-than-n input → no rows; `pos` is the
  * 0-based index of the gram's first token. CodegenFallback like
  * Spark's own explode family (generators run outside codegen).
  */
case class NGramHashGenerator(child: Expression, n: Int, hexLen: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1, s"ngram_hashes: n must be >= 1, got $n")
  require(hexLen >= 1 && hexLen <= 15,
    s"ngram_hashes: hexLen must be in [1,15] (BIGINT-safe), got $hexLen")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram_h", LongType, nullable = false)))

  override def prettyName: String = "ngram_hashes"

  private val space = Array[Byte](' ')

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val toks = raw.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) Nil
      else {
        val md = MessageDigest.getInstance("MD5")
        // pre-encode each token once — grams reuse the byte slices
        val tokBytes = new Array[Array[Byte]](toks.length)
        var t = 0
        while (t < toks.length) {
          tokBytes(t) = toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          t += 1
        }
        val out = new Array[InternalRow](toks.length - n + 1)
        var i = 0
        while (i <= toks.length - n) {
          md.reset()
          var j = 0
          while (j < n) {
            if (j > 0) md.update(space)
            md.update(tokBytes(i + j))
            j += 1
          }
          val digest = md.digest()
          var h = 0L
          var c = 0
          while (c < hexLen) {
            val nibble =
              if (c % 2 == 0) (digest(c / 2) >> 4) & 0xf else digest(c / 2) & 0xf
            h = (h << 4) | nibble
            c += 1
          }
          out(i) = InternalRow(i, h)
          i += 1
        }
        out
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramHashGenerator =
    copy(child = newChild)
}
