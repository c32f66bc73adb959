package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** Column-level entry points for graft's native Catalyst expressions
  * (SURVEY §4.4: custom `Expression` only where built-ins genuinely
  * can't express the semantics efficiently). */
package object functions {

  /** Codegen'd cosine similarity over two `array<double>` columns
    * (other numeric array types are cast here at the Column level). */
  def cosine_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a.cast("array<double>")),
      GraftBridge.expression(b.cast("array<double>"))))
  }

  /** Fused set-Jaccard over two distinct `array<string>` columns —
    * no intersection-array materialization (LSH verify hot path). */
  def jaccard_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(JaccardSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Jaro–Winkler string similarity (DuckDB-variant parameters) —
    * codegen'd; see [[JaroWinkler]]. */
  def jaro_winkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** All SRP band signatures of an `array<double>` vector in ONE
    * codegen'd pass: `weights` = bands·bits hyperplane rows (driver
    * constants), result = array of bands longs, band b bit j = sign of
    * <plane_{b·bits+j}, v>. Bit-identical to the zip_with-fold form
    * (same accumulation order); replaces bands·bits CodegenFallback
    * HOF folds per row on the banded-ANN map side. */
  def srp_band_sigs(v: Column, weights: Seq[Seq[Double]], bits: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SrpBandSigs(
      GraftBridge.expression(v.cast("array<double>")), weights, bits))
  }

  /** `bits`-bit SimHash majority signature of a distinct token array
    * in one map-side pass (md5-prefix hash family, `hexLen` hex chars
    * per token hash, ties → 1) — replaces explode + a bits+1-column
    * aggregate; bit-identical to that form (DedupSpec-pinned). */
  def simhash_sig(toks: Column, seed: String, bits: Int, hexLen: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SimHashSig(GraftBridge.expression(toks), seed, bits, hexLen))
  }

  /** All continuous random projections of an `array<double>` vector in
    * ONE codegen'd pass (`weights` = hyperplane rows, driver constants)
    * — the JL-reduction twin of `srp_band_sigs` (raw dot products, not
    * sign bits). Bit-identical to the zip_with-fold composition. */
  def rp_project(v: Column, weights: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(RpProject(
      GraftBridge.expression(v.cast("array<double>")), weights))
  }

  /** Product-quantization ADC score of an `array<int>` code word
    * against a probe's flat row-major `[sub][code]` lookup table
    * (driver constants, one `<probe subvector, centroid>` entry per
    * (subspace, code)) — the O(m) table-lookup approximation of the
    * inner product, codegen'd as one flat loop. Bit-identical to the
    * `transform`+`aggregate` fold (same accumulation order). */
  /** Saabas tree-path margin contributions of an `array<double>`
    * feature vector against a flattened tree ensemble (driver
    * constants) — one codegen'd walk, array<double> of per-feature
    * contributions out; see [[SaabasContribs]]. Replaced the repo's
    * last closure UDF (`graft.ml.TreeContributions`). */
  def saabas_contribs(
      v: Column,
      feat: Seq[Int], thr: Seq[Double], pred: Seq[Double],
      left: Seq[Int], right: Seq[Int],
      roots: Seq[Int], weights: Seq[Double], nFeatures: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SaabasContribs(
      GraftBridge.expression(v.cast("array<double>")),
      feat, thr, pred, left, right, roots, weights, nFeatures))
  }

  def pq_adc_score(codes: Column, lut: Seq[Double], k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(PqAdcScore(
      GraftBridge.expression(codes.cast("array<int>")), lut, k))
  }

  /** HLL leading-zero rank of a bigint (see [[HllRho]]): one LZCNT
    * intrinsic replacing the `length(bin(w))` string allocation on
    * the register-build scan. */
  def hll_rho(w: Column, maxRho: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(HllRho(GraftBridge.expression(w.cast("long")), maxRho))
  }

  /** Greedy longest-match subword segmentation stats of a
    * space-tokenized string against a fixed vocabulary:
    * struct(n_pieces, n_unk). The vocab is shipped once as a codegen
    * reference object (bounded driver artifact), so encoding is a
    * map-only scan projection. */
  def subword_stats(text: Column, vocab: Seq[String], maxPieceLen: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(SubwordStats(GraftBridge.expression(text), vocab, maxPieceLen))
  }

  /** Codegen'd Unicode NFC normalization of a string column (canonical
    * composition; ASCII / already-NFC inputs pass through zero-copy).
    * The canonical first step of corpus ingest — content hashes and
    * n-gram keys are only stable once text is in one canonical form. */
  def normalize_nfc(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NormalizeNFC(GraftBridge.expression(c)))
  }

  /** Row-generating sliding n-grams of a space-tokenized string:
    * `select(col("doc_id"), ngrams(col("text"), 8).as(Seq("pos", "gram")))`
    * — grams materialize inside the scan projection, no shuffle (the
    * window form pays a doc_id exchange + sort first). */
  def ngrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NGramGenerator(GraftBridge.expression(text), n))
  }

  /** The complete banded-minhash LSH keys of a document in one
    * map-side pass: `as.size / rowsPerBand` md5-hex band hashes over
    * affine minhash signatures of the text's sliding n-grams (n = 1 ⇒
    * tokens). Bit-identical to the composed explode → affine-min
    * aggregate → md5(concat_ws) pipeline (Dedup keeps that as the
    * baseline); null / <n-token text → null. */
  def minhash_band_hashes(
      text: Column, n: Int, seed: String,
      as: Seq[Long], bs: Seq[Long], prime: Long, rowsPerBand: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(MinHashBandHashes(
      GraftBridge.expression(text), n, seed, as, bs, prime, rowsPerBand))
  }

  /** Sliding n-grams pre-hashed to their `hexLen`-hex-char md5-prefix
    * BIGINT keys, as (pos, gram_h) rows — `ngrams` fused with the
    * `fp60`-style content key for pipelines that never touch the gram
    * text (decontamination). Row-for-row equal to
    * `ngrams(text, n)` + `conv(substring(md5(gram), 1, hexLen), 16, 10)`. */
  def ngram_hashes(text: Column, n: Int, hexLen: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(NGramHashGenerator(GraftBridge.expression(text), n, hexLen))
  }

  /** Non-overlapping `n`-token chunks (with partial tail) as
    * (chunk, chunk_text) rows — the strided sibling of `ngrams`;
    * chunks materialize inside the scan projection (the composed form
    * pays an exchange + per-chunk sort to reassemble order). */
  def chunks(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(ChunkGenerator(GraftBridge.expression(text), n))
  }

  /** Content-defined chunks as (chunk_idx, start_pos, n_tokens,
    * chunk_fp) rows — the CDC cut rule + 60-bit fingerprints fused
    * into one scan-side pass (see [[CdcChunkGenerator]]); replaces
    * the gram-explode + position-window + span-collapse + text-join
    * pipeline with zero pre-aggregate shuffles. */
  def cdc_chunks(text: Column, w: Int, divisor: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(CdcChunkGenerator(GraftBridge.expression(text), w, divisor))
  }

  /** Winnowing fingerprints of a string as sorted distinct rows —
    * `select(col("doc_id"), winnow_fingerprints(col("text"), 8, 4).as("fp"))`.
    * One per-row pass, no shuffle (replaces posexplode + windowed-min
    * + distinct; same md5-prefix hash family as the SQL oracle). */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(WinnowGenerator(GraftBridge.expression(text), k, w))
  }

  /** Spark's own distributed bloom-filter aggregate (the expression
    * behind runtime row-group filtering, Spark 3.3+) over a LongType
    * column: executors build partial sketches, the final merge yields
    * ONE serialized filter as a binary scalar. `expectedItems` /
    * `numBits` are silently clamped by Spark's runtime-bloom conf caps
    * (4M items / 64M bits by default) — past them the fpp degrades,
    * which callers must absorb with an exact verify. */
  def bloom_filter_agg(c: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftBridge.expression(c), Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
  }

  /** Codegen'd membership probe of a serialized bloom filter (the
    * `might_contain` expression runtime filters compile to): the
    * binary ships as a plan literal — deserialized once per task into
    * a reference object, probed inside whole-stage codegen. Replaces
    * the closure-UDF probe that blocked codegen at the filter node
    * (VERDICT r8 #6). */
  def might_contain(bloomBytes: Array[Byte], value: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
        GraftBridge.expression(value)))
  }

  private[functions] def intArg(e: Expression, what: String): Int = {
    // guard before eval: eval(null) on a non-foldable expression (e.g. a
    // column reference) throws an unbound-reference NPE at plan time —
    // surface the clean analysis error instead
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an integer literal, got non-foldable expression $e")
    e.eval(null) match {
      case i: Int => i
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  /** One-pass exact quantile aggregate (distributed buffers, one final
    * sort — replaces the reference's collect-to-driver threshold rule). */
  def exact_quantile(c: Column, q: Double): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      ExactQuantile(GraftBridge.expression(c), q).toAggregateExpression())
  }

  /** Misra–Gries heavy-hitter candidate aggregate: ≤ k counters of
    * state per buffer, any item with frequency > n/(k+1) guaranteed
    * present. Candidates only — re-count exactly for the
    * deterministic frequent-items answer (`TextAnalysis
    * .frequentTokens`). */
  def misra_gries(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
  }

  /** Bottom-k distinct-longs KMV sketch aggregate: ≤ k values of
    * state per group regardless of input size, lossless merge, sorted
    * ascending array out. The streaming/single-pass twin of
    * `queries/Sketches.kmvSketch` (pinned equal in FunctionsSpec). */
  def bottom_k(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      BottomK(GraftBridge.expression(c), k).toAggregateExpression())
  }

  /** Exact most-frequent-long argmax with the (count DESC, value ASC)
    * tiebreak in ONE aggregation — the LPA round's count→argmax fusion
    * (one keyed exchange per round instead of two). */
  def label_mode(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      LabelMode(GraftBridge.expression(c)).toAggregateExpression())
  }

  private[functions] def quantileArg(e: Expression): Double = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"exact_quantile: second argument must be a numeric literal, got non-foldable expression $e")
    e.eval(null) match {
      case d: Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL `0.5` literal
      case n: Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"exact_quantile: second argument must be a numeric literal, got $other")
    }
  }

  /** Idempotent SQL registration of the whole function family on an
    * existing session: `cosine_similarity(a, b)`,
    * `jaccard_similarity(a, b)`, `exact_quantile(x, q)`. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_similarity",
      exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "jaccard_similarity",
      exprs => JaccardSimilarity(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "exact_quantile",
      exprs => ExactQuantile(exprs.head, quantileArg(exprs(1))).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction(
      "ngrams",
      exprs => NGramGenerator(exprs.head, intArg(exprs(1), "ngrams: n")), "built-in")
    reg.createOrReplaceTempFunction(
      "chunks",
      exprs => ChunkGenerator(exprs.head, intArg(exprs(1), "chunks: n")), "built-in")
    reg.createOrReplaceTempFunction(
      "misra_gries",
      exprs => MisraGries(exprs.head, intArg(exprs(1), "misra_gries: k"))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "normalize_nfc",
      exprs => NormalizeNFC(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "bottom_k",
      exprs => BottomK(exprs.head, intArg(exprs(1), "bottom_k: k"))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "label_mode",
      exprs => LabelMode(exprs.head).toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction(
      "jaro_winkler",
      exprs => JaroWinkler(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_chunks",
      exprs => CdcChunkGenerator(exprs.head,
        intArg(exprs(1), "cdc_chunks: w"), intArg(exprs(2), "cdc_chunks: divisor")),
      "built-in")
  }
}

package functions {

  /** Cluster registration path: `--conf spark.sql.extensions=
    * graft.functions.GraftExtensions` injects the function family into
    * every session at startup (the SparkSessionExtensions surface). */
  class GraftExtensions extends (SparkSessionExtensions => Unit) {
    override def apply(e: SparkSessionExtensions): Unit = {
      // whole-operator surface: native as-of join planner strategy +
      // the operator's probe-side filter pushdown rule
      e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
      e.injectOptimizerRule(_ => graft.plans.AsOfJoinFilterPushdown)
      e.injectFunction((
        FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
        (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
      e.injectFunction((
        FunctionIdentifier("jaccard_similarity"),
        new ExpressionInfo(classOf[JaccardSimilarity].getName, "jaccard_similarity"),
        (exprs: Seq[Expression]) => JaccardSimilarity(exprs.head, exprs(1))))
      e.injectFunction((
        FunctionIdentifier("exact_quantile"),
        new ExpressionInfo(classOf[ExactQuantile].getName, "exact_quantile"),
        (exprs: Seq[Expression]) =>
          ExactQuantile(exprs.head, graft.functions.quantileArg(exprs(1)))
            .toAggregateExpression()))
      e.injectFunction((
        FunctionIdentifier("ngrams"),
        new ExpressionInfo(classOf[NGramGenerator].getName, "ngrams"),
        (exprs: Seq[Expression]) =>
          NGramGenerator(exprs.head, graft.functions.intArg(exprs(1), "ngrams: n"))))
      e.injectFunction((
        FunctionIdentifier("chunks"),
        new ExpressionInfo(classOf[ChunkGenerator].getName, "chunks"),
        (exprs: Seq[Expression]) =>
          ChunkGenerator(exprs.head, graft.functions.intArg(exprs(1), "chunks: n"))))
      e.injectFunction((
        FunctionIdentifier("normalize_nfc"),
        new ExpressionInfo(classOf[NormalizeNFC].getName, "normalize_nfc"),
        (exprs: Seq[Expression]) => NormalizeNFC(exprs.head)))
      e.injectFunction((
        FunctionIdentifier("jaro_winkler"),
        new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
        (exprs: Seq[Expression]) => JaroWinkler(exprs.head, exprs(1))))
      // aggregate sketches — keep the cluster surface in lockstep with
      // registerAll (these two had drifted: session-registered only)
      e.injectFunction((
        FunctionIdentifier("misra_gries"),
        new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
        (exprs: Seq[Expression]) =>
          MisraGries(exprs.head, graft.functions.intArg(exprs(1), "misra_gries: k"))
            .toAggregateExpression()))
      e.injectFunction((
        FunctionIdentifier("bottom_k"),
        new ExpressionInfo(classOf[BottomK].getName, "bottom_k"),
        (exprs: Seq[Expression]) =>
          BottomK(exprs.head, graft.functions.intArg(exprs(1), "bottom_k: k"))
            .toAggregateExpression()))
      e.injectFunction((
        FunctionIdentifier("cdc_chunks"),
        new ExpressionInfo(classOf[CdcChunkGenerator].getName, "cdc_chunks"),
        (exprs: Seq[Expression]) =>
          CdcChunkGenerator(exprs.head,
            graft.functions.intArg(exprs(1), "cdc_chunks: w"),
            graft.functions.intArg(exprs(2), "cdc_chunks: divisor"))))
    }
  }
}
