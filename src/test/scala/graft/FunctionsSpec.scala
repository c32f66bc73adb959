package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Native CosineSimilarity expression: correctness vs the HOF
  * composition, SQL registration, codegen participation, and the
  * speedup that justifies the custom expression. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .cache()

  test("native expression == zip_with/aggregate composition, bit for bit") {
    val probe = emb.filter(col("vec_id") === 0L).select(col("v").as("p"))
    val joined = emb.crossJoin(broadcast(probe))
    val native = joined.select(col("vec_id"),
      graft.functions.cosine_similarity(col("v"), col("p")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hof = joined.select(col("vec_id"),
      Similarity.cosineHof(col("v"), col("p")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native.keySet === hof.keySet)
    val diverging = native.count { case (id, v) => hof(id) != v }
    assert(diverging === 0, s"$diverging rows diverge (must be bit-identical)")
  }

  test("SQL registration: the whole function family works after registerAll") {
    graft.functions.registerAll(spark)
    emb.createOrReplaceTempView("emb_view")
    val n = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.v, b.v) AS c
        |FROM emb_view a JOIN emb_view b ON b.vec_id = 0""".stripMargin)
      .filter(col("c").isNotNull).count()
    assert(n === emb.count())
    // jaccard_similarity from SQL
    val j = spark.sql(
      "SELECT jaccard_similarity(array('a','b'), array('b','c')) AS j").head().getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
    // exact_quantile from SQL (aggregate with a literal quantile)
    Tables.orders(spark, sf("sf0.001")).createOrReplaceTempView("orders_view")
    val viaSql = spark.sql(
      "SELECT exact_quantile(o_totalprice, 0.5) FROM orders_view").head().getDouble(0)
    val viaStat = Tables.orders(spark, sf("sf0.001"))
      .stat.approxQuantile("o_totalprice", Array(0.5), 0.0).head
    assert(viaSql === viaStat)
    // jaro_winkler from SQL
    val jw = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
  }

  test("extensions surface: a session built with GraftExtensions resolves the family from SQL") {
    // The cluster registration path (--conf spark.sql.extensions=...)
    // must stay in lockstep with registerAll — misra_gries/bottom_k had
    // drifted (session-registered only). Build a NEW SparkSession on
    // the shared context with the extensions applied, probe one
    // function of each kind, restore the shared session.
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      assert(ext ne shared, "expected a fresh session carrying the extensions")
      val jw = ext.sql("SELECT jaro_winkler('martha', 'marhta') AS jw").head().getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-12)
      // the two formerly-drifted aggregates resolve now
      val mg = ext.sql(
        "SELECT misra_gries(t, 2) FROM VALUES ('a'),('a'),('a'),('b') AS v(t)")
        .head().getSeq[String](0)
      assert(mg.contains("a"))
      val bk = ext.sql(
        "SELECT bottom_k(x, 2) FROM VALUES (3L),(1L),(2L) AS v(x)").head().getSeq[Long](0)
      assert(bk === Seq(1L, 2L))
      // generator + scalar round out the kinds
      val ch = ext.sql("SELECT chunks('a b c', 2)").count()
      assert(ch === 2L)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    val df = emb.select(
      graft.functions.cosine_similarity(col("v"), col("v")).as("c"))
    df.collect()
    // the projection must carry the *(n) whole-stage-codegen marker, and
    // the generated code must contain our primitive loop (a
    // CodegenFallback expression would leave neither)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("*(2) Project"), plan)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("numElements"), "expression loop not found in generated code")
  }

  test("jaccard_similarity == array_intersect formulation on distinct sets") {
    val toks = graft.llm.Dedup.tokenized(
      Tables.documents(spark, sf("sf0.001"))).cache()
    val pairs = toks.as("a").crossJoin(broadcast(toks.limit(20).as("b")))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        col("a.toks").as("ta"), col("b.toks").as("tb"))
    val inter = size(array_intersect(col("ta"), col("tb")))
    val viaBuiltins = pairs.select(col("ia"), col("ib"),
      (inter * lit(1.0) / (size(col("ta")) + size(col("tb")) - inter)).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaNative = pairs.select(col("ia"), col("ib"),
      graft.functions.jaccard_similarity(col("ta"), col("tb")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaBuiltins.keySet === viaNative.keySet)
    val diverging = viaBuiltins.count { case (k, v) => viaNative(k) != v }
    assert(diverging === 0, s"$diverging pairs diverge")
    toks.unpersist()
  }

  test("jaccard_similarity edge cases: empty sets, disjoint, identical") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b"), Seq("a", "b")),
      (2L, Seq("a", "b"), Seq("c", "d")),
      (3L, Seq.empty[String], Seq.empty[String]),
      (4L, Seq("a"), Seq.empty[String]))
      .toDF("id", "x", "y")
    val out = df.select(col("id"),
      graft.functions.jaccard_similarity(col("x"), col("y")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0))
  }

  test("exact_quantile aggregate == exact approxQuantile, distributed") {
    import graft.pipeline.Telemetry
    import graft.ml.FailureModel
    val scored = FailureModel.linearScore(
      Telemetry.features(Tables.events(spark, sf("sf0.001"))))
      .select(col("failure_probability").as("p"), col("failure_next"))
      .cache()
    for (q <- Seq(0.0, 0.2, 0.5, 0.8, 1.0)) {
      val viaAgg = scored.agg(
        graft.functions.exact_quantile(col("p"), q)).head().getDouble(0)
      val viaStat = scored.stat.approxQuantile("p", Array(q), 0.0).head
      assert(viaAgg === viaStat, s"q=$q: $viaAgg != $viaStat")
    }
    // grouped form (approxQuantile can't do this without a loop)
    val grouped = scored.groupBy(col("failure_next"))
      .agg(graft.functions.exact_quantile(col("p"), 0.5).as("med"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(grouped.keySet === Set(0, 1))
    assert(grouped.values.forall(v => v > 0.0 && v < 1.0))
    scored.unpersist()
  }

  test("ngrams generator == window composition, with zero shuffles") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables.documents(spark, sf("sf0.01"))
    val gen = graft.llm.Curation.ngramRows(docs, 8)
    val win = graft.llm.Curation.ngramRowsWindowed(docs, 8)
    // identical multisets of (doc_id, gram)
    assert(gen.exceptAll(win).count() === 0 && win.exceptAll(gen).count() === 0)
    // the generator form never shuffles; the window form must
    gen.count()
    val genPlan = collectPlan(gen.queryExecution.executedPlan)
    assert(!genPlan.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"generator n-grams shuffled:\n${gen.queryExecution.executedPlan}")
    win.count()
    assert(collectPlan(win.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeExec]))
    // positions are right too: first gram of doc 0 == first 8 tokens
    val first = docs.filter(col("doc_id") === 0)
      .select(col("text")).head.getString(0).split(" ").take(8).mkString(" ")
    assert(gen.filter(col("doc_id") === 0).head.getString(1) === first)
  }

  test("custom generator honors OUTER semantics (null row when no grams)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.GeneratorOuter
    val df = Seq((1L, "a b"), (2L, "a b c")).toDF("id", "text")
    val outer = GraftBridge.column(GeneratorOuter(
      graft.functions.NGramGenerator(GraftBridge.expression(col("text")), 3)))
    val rows = df.select(col("id"), outer.as(Seq("pos", "gram")))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) null else r.getString(2)))
    // doc 1 is too short for a 3-gram → kept with a null gram (outer);
    // doc 2 yields its single gram
    assert(rows.toSet === Set((1L, null), (2L, "a b c")))
  }

  test("ngrams generator is SQL-callable after registration") {
    graft.functions.registerAll(spark)
    // a generator's output columns flatten into the projection
    val out = spark.sql("SELECT ngrams('a b c d', 2)").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((0, "a b"), (1, "b c"), (2, "c d")))
  }

  test("winnow generator == composed posexplode+window form, and faster") {
    import graft.llm.TextAnalysis
    val docs = Tables.documents(spark, sf("sf0.01"))
    val gen = docs.select(col("doc_id"),
      graft.functions.winnow_fingerprints(col("text"), 8, 4).as("fp"))
    val composed = TextAnalysis.winnowComposed(docs, 8, 4)
    assert(gen.exceptAll(composed).count() === 0 &&
      composed.exceptAll(gen).count() === 0)
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    gen.count(); composed.count() // warm
    val tGen = time(gen.count())
    val tComposed = time(composed.count())
    info(f"generator: $tGen%.2fs  composed: $tComposed%.2fs  speedup: ${tComposed / tGen}%.1f×")
  }

  test("winnow generator matches the composed form on non-BMP text (code points, not code units)") {
    import spark.implicits._
    import graft.llm.TextAnalysis
    // surrogate-pair characters: each emoji is 2 UTF-16 code units but ONE
    // code point — Spark substr and the DuckDB oracle count code points, so
    // a code-unit walk would hash different k-grams here
    val docs = Seq(
      (1L, "the 😀 quick 🦊 brown fox 🀄 jumps over"),
      (2L, "😀😀😀 repeated emoji 😀😀😀 and 𝕌𝕟𝕚𝕔𝕠𝕕𝕖 math"),
      (3L, "short😀"))
      .toDF("doc_id", "text")
    val gen = docs.select(col("doc_id"),
      graft.functions.winnow_fingerprints(col("text"), 8, 4).as("fp"))
    val composed = TextAnalysis.winnowComposed(docs, 8, 4)
    assert(gen.exceptAll(composed).count() === 0 &&
      composed.exceptAll(gen).count() === 0)
  }

  test("ngrams/exact_quantile reject non-literal arguments with a clean analysis error") {
    graft.functions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT ngrams(text, doc_id) FROM parquet.`/root/testdata/sf0.001/documents.parquet`").collect()
    }
    // the clean IllegalArgumentException, not an unbound-reference NPE
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(_.contains("integer literal"))), e.toString)
  }

  test("normalize_nfc: composes decomposed text, passes ASCII/NFC through zero-copy") {
    import org.apache.spark.unsafe.types.UTF8String
    // decomposed e+COMBINING ACUTE, Hangul jamo, and non-BMP text with a
    // combining mark after the surrogate pair — the cases where NFC must
    // recompose, and where a code-unit-naive walk would corrupt
    val decomposed = "résumé"
    val jamo = "가" // ᄀ + ᅡ → 가
    val nonBmp = "😀é" // 😀 + decomposed é
    val rows = Seq((1L, decomposed), (2L, jamo), (3L, nonBmp),
      (4L, "plain ascii"), (5L, null.asInstanceOf[String])).toDF("id", "t")
    val got = rows.select(col("id"), graft.functions.normalize_nfc(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    def ref(s: String) = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    assert(got(1L) === ref(decomposed) && got(1L) === "résumé")
    assert(got(2L) === ref(jamo) && got(2L).length === 1)
    assert(got(3L) === ref(nonBmp) && got(3L) === "😀é")
    assert(got(4L) === "plain ascii")
    assert(got(5L) === null, "null must stay null")
    // zero-copy fast paths: same UTF8String instance back, no re-encode
    val ascii = UTF8String.fromString("plain ascii")
    assert(graft.functions.NormalizeNFC.nfc(ascii) eq ascii)
    val alreadyNfc = UTF8String.fromString("résumé")
    assert(graft.functions.NormalizeNFC.nfc(alreadyNfc) eq alreadyNfc)
  }

  test("normalize_nfc is SQL-callable and stays inside whole-stage codegen") {
    graft.functions.registerAll(spark)
    val df = spark.sql(
      "SELECT normalize_nfc(concat(text, ' résumé')) AS n " +
        s"FROM parquet.`${sf("sf0.001")}/documents.parquet`")
    assert(df.collect().forall(_.getString(0).endsWith(" résumé")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan) // no CodegenFallback break
  }

  test("native srp_band_sigs == HOF banded signatures, bit for bit (and bucket == band 0)") {
    val embFull = Tables.embeddings(spark, sf("sf0.01"))
    val native = Similarity.srpBanded(embFull)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val hof = Similarity.srpBandedHof(embFull)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(native.keySet === hof.keySet)
    val diverging = native.count { case (k, v) => hof(k) != v }
    assert(diverging === 0, s"$diverging banded signatures diverge (must be bit-identical)")
    // legacy 8-bit bucket (native) == HOF bucket == band 0's signature
    val v = col("embedding").cast("array<double>")
    val buckets = embFull.select(col("vec_id"),
      Similarity.srpBucket(v).as("nb"), Similarity.srpBucketHof(v).as("hb"))
      .collect()
    assert(buckets.forall(r => r.getLong(1) == r.getLong(2)), "bucket native != HOF")
    buckets.foreach { r =>
      assert(r.getLong(1) === native((r.getLong(0), 0)), "bucket != band 0 signature")
    }
  }

  test("srp_band_sigs null semantics mirror the HOF fold (null vec -> null; null element -> zero sigs)") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(-2.0), Some(0.5)))),
      (2L, Some(Seq(Some(1.0), None, Some(0.5)))), // null element
      (3L, Option.empty[Seq[Option[Double]]])      // null vector
    ).toDF("vec_id", "v")
    val out = df.select(col("vec_id"),
      graft.functions.srp_band_sigs(col("v"), Seq(Seq(0.3, -0.1, 0.2), Seq(-0.4, 0.0, 0.1)), 2).as("sigs"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(3L).isEmpty, "null vector must yield null")
    assert(out(2L).get.asInstanceOf[scala.collection.Seq[Long]] === Seq(0L),
      "null element must poison every projection (HOF when(null >= 0) -> 0)")
    assert(out(1L).nonEmpty)
  }

  test("srp_band_sigs dim mismatch == HOF zip_with null-padding (zero sigs, not a truncated dot)") {
    // ADVICE r7: the native loop used to truncate to min(n, dim) and emit a
    // PARTIAL dot product on malformed vectors; zip_with pads the shorter
    // side with null, poisoning the fold -> every signature 0. Pin both
    // directions (short and long) against an inline HOF fold on the same
    // tiny planes so the claimed bit-identity holds on malformed input too.
    val planes = Seq(Seq(0.3, -0.1, 0.2), Seq(-0.4, 0.5, 0.1))
    val df = Seq(
      (1L, Seq(1.0, -2.0, 0.5)),      // matching dim: real signature
      (2L, Seq(1.0, -2.0)),           // short: zip_with pads v with null
      (3L, Seq(1.0, -2.0, 0.5, 9.0)) // long: zip_with pads the plane with null
    ).toDF("vec_id", "v")
    val native = df.select(col("vec_id"),
      graft.functions.srp_band_sigs(col("v"), planes, 2).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hofSig = planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(col("v"), typedLit(p), (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, lit(1L) * (1L << j)).otherwise(0L)
    }.reduce(_ + _)
    val hof = df.select(col("vec_id"), hofSig.as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(1L, 2L, 3L))
      assert(native(id) === Seq(hof(id)), s"vec $id: native ${native(id)} != HOF ${hof(id)}")
    assert(native(2L) === Seq(0L) && native(3L) === Seq(0L),
      "mismatched-dim vectors must yield all-zero signatures")
    assert(native(1L) !== Seq(0L), "well-formed vector must produce a real signature")
  }

  test("native rp_project == HOF zip_with folds bit for bit; poisons like the fold; codegen") {
    // r8 (VERDICT r7 task 7): the last HOF residual on a declared-query map
    // side. Bit-identity on the real corpus (same accumulation order ⇒
    // EXACT double equality, not approximate)...
    val v = col("embedding").cast("array<double>")
    val both = Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"),
        Similarity.rpProject(v).as("n"), Similarity.rpProjectHof(v).as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2),
        s"vec ${r.getLong(0)}: native != HOF")
    }
    // ...poison semantics: null element and dim-mismatch both yield all-null
    // projections (zip_with pads with null), never a truncated partial dot
    val weird = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),  // wrong dim (Dim = 64)
      (2L, Seq[java.lang.Double](1.0, null, 3.0))) // null element
      .toDF("vec_id", "v")
    val out = weird.select(col("vec_id"),
        Similarity.rpProject(col("v")).as("n"), Similarity.rpProjectHof(col("v")).as("h"))
      .collect()
    out.foreach { r =>
      val n = r.getSeq[Any](1); val h = r.getSeq[Any](2)
      assert(n.size === Similarity.RpDims && n.forall(_ == null),
        s"vec ${r.getLong(0)}: native must be all-null, got $n")
      assert(n === h, s"vec ${r.getLong(0)}: native != HOF on malformed input")
    }
    // ...and the native path stays inside whole-stage codegen
    val plan = Tables.embeddings(spark, sf("sf0.001"))
      .select(Similarity.rpProject(v).as("rp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("native pq_adc_score == HOF transform+aggregate fold bit for bit; stricter on garbage; codegen") {
    val rnd = new scala.util.Random(7)
    val m = 8
    val k = 16
    val lut = Seq.fill(m * k)(rnd.nextGaussian())
    // every code word a PQ builder can emit is m in-range ints — the two
    // forms must agree EXACTLY (same accumulation order ⇒ double equality)
    val codesDf = (0L until 200L).map(i => (i, Seq.fill(m)(rnd.nextInt(k))))
      .toDF("id", "codes")
    val both = codesDf.select(col("id"),
        graft.functions.pq_adc_score(col("codes"), lut, k).as("n"),
        Similarity.pqAdcScoreHof(col("codes"), lut, k).as("h"))
      .collect()
    assert(both.length === 200)
    both.foreach(r => assert(r.getDouble(1) === r.getDouble(2),
      s"code word ${r.getLong(0)}: native != HOF"))
    // poison parity where the fold CAN express it: null array, null element
    val weird = Seq(
      (1L, Option(Seq[Integer](0, 1, 2, 3, 4, 5, 6, 7))),
      (2L, Option(Seq[Integer](0, 1, 2, 3, null, 5, 6, 7))), // null element
      (3L, Option.empty[Seq[Integer]])                       // null codes
    ).toDF("id", "codes")
    val w = weird.select(col("id"),
        graft.functions.pq_adc_score(col("codes"), lut, k).as("n"),
        Similarity.pqAdcScoreHof(col("codes"), lut, k).as("h"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(w(1L)._1.nonEmpty && w(1L)._1 === w(1L)._2)
    assert(w(2L)._1.isEmpty && w(2L)._2.isEmpty, "null element must score null in both forms")
    assert(w(3L)._1.isEmpty && w(3L)._2.isEmpty, "null codes must score null in both forms")
    // structurally invalid codes: native nulls DEFENSIVELY (the fold would
    // return a plausible-but-wrong number: try_element_at indexes from the
    // end on negatives, a short word just sums fewer terms)
    val bad = Seq(
      (1L, Seq(0, 1, 2)),                  // arity ≠ m
      (2L, Seq(0, 1, 2, 3, 4, 5, 6, 16)),  // code ≥ k
      (3L, Seq(0, 1, 2, 3, 4, 5, 6, -1)))  // negative code
      .toDF("id", "codes")
    val badOut = bad.select(
        graft.functions.pq_adc_score(col("codes"), lut, k).as("n"))
      .collect()
    assert(badOut.forall(_.isNullAt(0)),
      "structurally invalid code words must score null, never a partial sum")
    // and the native path stays inside whole-stage codegen (a range leaf,
    // not a toDF local relation — that constant-folds to LocalTableScan)
    val plan = spark.range(100)
      .select(array((0 until m).map(s =>
        pmod(hash(col("id"), lit(s)), lit(k)).cast("int")): _*).as("codes"))
      .select(graft.functions.pq_adc_score(col("codes"), lut, k).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("ngram_hashes generator == ngrams + md5-prefix conv, row for row") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val fused = docs.select(col("doc_id"),
        graft.functions.ngram_hashes(col("text"), 8, 15).as(Seq("pos", "gram_h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val composed = docs.select(col("doc_id"),
        graft.functions.ngrams(col("text"), 8).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("gram_h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fused === composed)
    assert(fused.nonEmpty)
    // non-ASCII tokens hash over UTF-8 bytes identically
    val uni = Seq((1L, "résumé naïve ça va bien aujourd'hui mon ami voilà")).toDF("doc_id", "text")
    val f2 = uni.select(graft.functions.ngram_hashes(col("text"), 2, 15).as(Seq("p", "h")))
      .select("h").as[Long].collect().toSet
    val c2 = uni.select(graft.functions.ngrams(col("text"), 2).as(Seq("p", "g")))
      .select(conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")).as[Long].collect().toSet
    assert(f2 === c2)
  }

  test("subword_stats: greedy longest-match semantics, UNK fallback, codegen") {
    val vocab = Seq("ab", "abc", "d", "x", "un", "affable")
    val df = Seq(
      (1L, "abcd"),      // greedy: "abc"+"d" (2 pieces) — NOT "ab"+UNK+"d"
      (2L, "unaffable"), // "un"+"affable" = 2 pieces
      (3L, "xyx"),       // "x"+UNK(y)+"x" = 3 pieces, 1 unk
      (4L, "abcd xyx"),  // sums across words: 5 pieces, 1 unk
      (5L, ""))          // empty text → 0/0
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.subword_stats(col("text"), vocab, 7).as("s"))
      .select(col("doc_id"), col("s.n_pieces"), col("s.n_unk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 0L), (2L, 2L, 0L), (3L, 3L, 1L),
      (4L, 5L, 1L), (5L, 0L, 0L)), s"got $out")
    // maxPieceLen caps the probe window: with max 2, "abc" can't match
    val capped = df.filter(col("doc_id") === 1)
      .select(graft.functions.subword_stats(col("text"), vocab, 2).as("s"))
      .select(col("s.n_pieces"), col("s.n_unk")).as[(Long, Long)].head()
    assert(capped === ((3L, 1L)), s"got $capped") // "ab"+UNK(c)+"d"
    // stays inside whole-stage codegen (reference-object vocab, no
    // fallback) — on a parquet scan; the literal frame above folds to
    // a LocalTableScan at plan time
    val q = Tables.documents(spark, sf("sf0.001"))
      .select(graft.functions.subword_stats(col("text"), vocab, 7).as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(q.queryExecution.executedPlan)
    assert(codegen.contains("SubwordStats.compute"), "compute call not in generated code")
  }

  test("subword_stats segments by code points: surrogate pairs never split (ADVICE r8)") {
    // U+1F600 GRINNING FACE is non-BMP (2 UTF-16 chars). The vocab is
    // learned via Spark SQL substring — code-point semantics — so the
    // native segmentation must count piece lengths in code points and
    // consume a WHOLE code point on UNK (a char-indexed advance would
    // probe half-surrogates against the vocab).
    val g = new String(Character.toChars(0x1F600))
    val vocab = Seq(g + g, "a", "zz")
    val df = Seq(
      (1L, g + g + "a"),      // [g+g] + [a]           → 2 pieces, 0 unk
      (2L, g + "b"),          // UNK(g as ONE cp) + UNK(b) → 2 pieces, 2 unk
      (3L, g + g + g + "zz")) // [g+g] + UNK(g) + [zz] → 3 pieces, 1 unk
      .toDF("doc_id", "text")
    // maxPieceLen = 2 CODE POINTS: the 2-cp (4-char) piece must match
    val out = df.select(col("doc_id"),
        graft.functions.subword_stats(col("text"), vocab, 2).as("s"))
      .select(col("doc_id"), col("s.n_pieces"), col("s.n_unk"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 2L, 0L), (2L, 2L, 2L), (3L, 3L, 1L)), s"got $out")
  }

  test("learnSubwordVocab: frequency-ranked pieces with deterministic tie-break") {
    val docs = Seq(
      (1L, "aaa aaa aaa"), (2L, "aaa aaa"), (3L, "bc bc"))
      .toDF("doc_id", "text")
    // word freqs: aaa×5, bc×2. Pieces of "aaa" (w=5 each occurrence):
    // "a"×3·5=15, "aa"×2·5=10, "aaa"×1·5=5; pieces of "bc" (w=2):
    // "b"=2, "c"=2, "bc"=2.
    val v = graft.llm.TextAnalysis.learnSubwordVocab(docs, maxVocab = 4, maxPieceLen = 3)
    assert(v === Seq("a", "aa", "aaa", "b"), s"got $v") // 15, 10, 5, then tie (2,2,2) → asc
    // the declared query's encode under this vocab is deterministic
    val enc = graft.llm.TextAnalysis.subwordStats(docs, v, 3)
      .orderBy("doc_id")
      .select("n_pieces", "n_unk").as[(Long, Long)].collect().toSeq
    assert(enc === Seq((3L, 0L), (2L, 0L), (4L, 2L)), s"got $enc")
    // "bc" → "b" + UNK(c) per occurrence: 2 words × 2 pieces, 2 unk ✓
  }

  test("iterative BPE learns the published merge order and applies greedily") {
    import graft.llm.TextAnalysis
    // the classic worked example (Sennrich et al. 2016 §3.2 shape):
    // low×5, lower×2, newest×6, widest×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextAnalysis.learnBpeMerges(docs, nMerges = 3)
    // pair weights: (e,s)=9 ties (s,t)=9 → pair-asc tie-break picks (e,s);
    // then (es,t)=9 dominates; then (l,o)=7 ties (o,w)=7 → (l,o)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o")), s"got $merges")
    // the full audit table (r18, the text_bpe_train declaration):
    // rank + selection-time weight ride along with each merge
    val table = TextAnalysis.bpeMergeTable(docs, nMerges = 3)
    assert(table === Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)),
      s"got $table")
    // greedy apply: "newest" → n,e,w,est (4 pieces); "low" → lo,w (2);
    // "lower" → lo,w,e,r (4); "widest" → w,i,d,est (4)
    val enc = TextAnalysis.bpeStats(docs, merges)
      .select("n_tokens", "n_pieces").as[(Long, Long)].head()
    assert(enc === ((16L, 5 * 2 + 2 * 4 + 6 * 4 + 3 * 4)), s"got $enc")
    // greedy overlap rule: merge (a,a) over "aaa" consumes left-to-right
    val aa = TextAnalysis.bpeStats(
      Seq((1L, "aaa")).toDF("doc_id", "text"), Seq(("a", "a")))
      .select("n_pieces").as[Long].head()
    assert(aa === 2L, s"'aaa' under (a,a) must be [aa, a], got $aa pieces")
    // degenerate whitespace (ADVICE r18): empty split words contribute
    // ZERO pieces (split("", "") yields [""] and used to count 1),
    // while n_tokens keeps counting the raw split — and an
    // only-empty-tokens doc reports (n_tokens, 0, 0.0), matching the
    // oracle's length>0 token set + LEFT JOIN/COALESCE form
    val ws = TextAnalysis.bpeStats(
      Seq((1L, " low  low "), (2L, "   ")).toDF("doc_id", "text"),
      Seq(("l", "o")))
      .orderBy("doc_id")
      .select("n_tokens", "n_pieces", "pieces_per_token")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 1: split → ["", "low", "", "low", ""] = 5 tokens, the two
    // real words encode as [lo, w] = 2 pieces each; doc 2: 4 empty
    // tokens, 0 pieces
    assert(ws === Seq((5L, 4L, 0.8), (4L, 0L, 0.0)), s"got $ws")
  }

  test("label_mode aggregate equals the declarative count→argmax two-step, with the (c desc, label asc) tiebreak") {
    import spark.implicits._
    // random-ish grouped labels with planted ties, spread over
    // partitions so partial buffers really merge across the exchange
    val rows = (0L until 4000L).map { i =>
      (i % 37, (i * 2654435761L % 7) % 5) // (group, label) with ties
    }
    val df = rows.toDF("a", "label").repartition(13)
    val viaAgg = df.groupBy(col("a"))
      .agg(graft.functions.label_mode(col("label")).as("label"))
    val viaTwoStep = df.groupBy(col("a"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("a"))
      .agg(max_by(col("label"), struct(col("c"), (-col("label")).as("nl"))).as("label"))
    assert(viaAgg.exceptAll(viaTwoStep).count() === 0L &&
      viaTwoStep.exceptAll(viaAgg).count() === 0L,
      "fused label_mode must equal the two-step count→argmax")
    // explicit tie: labels 1 and 2 both twice → smallest label wins
    val tie = Seq((1L, 2L), (1L, 2L), (1L, 1L), (1L, 1L), (1L, 9L))
      .toDF("a", "label").repartition(3)
    assert(tie.groupBy(col("a")).agg(graft.functions.label_mode(col("label")))
      .collect()(0).getLong(1) === 1L, "tie must break to the smallest label")
    // SQL registration
    graft.functions.registerAll(spark)
    tie.createOrReplaceTempView("lm_tie")
    assert(spark.sql("SELECT label_mode(label) FROM lm_tie GROUP BY a")
      .collect()(0).getLong(0) === 1L)
    // serialize/deserialize round-trip (the partial-buffer wire format)
    val lm = graft.functions.LabelMode(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val buf = scala.collection.mutable.LongMap(5L -> 3L, -2L -> 7L, 0L -> 1L)
    assert(lm.deserialize(lm.serialize(buf)) === buf)
    assert(lm.eval(scala.collection.mutable.LongMap.empty[Long]) === null)
  }

  test("bottom_k aggregate equals the declarative window bottom-k, dedups, handles nulls and below-k") {
    import spark.implicits._
    // per-group agg vs queries/Sketches.kmvSketch on the same data:
    // identical sorted sketch arrays (KMV's lossless merge means the
    // partial-buffer path can't change the answer)
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_returnflag").as("grp"),
        graft.queries.Sketches.h48("kmv:", col("l_orderkey").cast("string")).as("h"))
    val viaAgg = li.groupBy("grp")
      .agg(graft.functions.bottom_k(col("h"), graft.queries.Sketches.KmvK).as("sk"))
      .select(col("grp"), explode(col("sk")).as("h"))
    val viaWindow = graft.queries.Sketches.kmvSketch(
      Tables.lineitem(spark, sf("sf0.001")), "l_returnflag", "l_orderkey")
    assert(viaAgg.exceptAll(viaWindow).count() === 0L)
    assert(viaWindow.exceptAll(viaAgg).count() === 0L)
    // duplicates collapse, nulls skipped, below-k returns the whole set
    val tiny = Seq(Some(5L), Some(5L), Some(1L), None, Some(9L))
      .toDF("h").repartition(3)
    val sk = tiny.agg(graft.functions.bottom_k(col("h"), 64)).as[Seq[Long]].head()
    assert(sk === Seq(1L, 5L, 9L))
    // k enforced: keeps the k SMALLEST across partitions
    val sk2 = (1L to 100L).toDF("h").repartition(7)
      .agg(graft.functions.bottom_k(col("h"), 10)).as[Seq[Long]].head()
    assert(sk2 === (1L to 10L))
    // SQL registration
    graft.functions.registerAll(spark)
    tiny.createOrReplaceTempView("bk_tiny")
    val viaSql = spark.sql("SELECT bottom_k(h, 2) FROM bk_tiny").as[Seq[Long]].head()
    assert(viaSql === Seq(1L, 5L))
  }

  test("native expression is measurably faster than the HOF composition") {
    // inflate rows via self-cross against 200 probes to get a stable signal
    val probes = emb.limit(200).select(col("v").as("p"))
    val joined = emb.crossJoin(probes) // 500 × 200 = 100k cosine evals
    def time(f: => Double): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once (codegen compile, JIT)
    joined.select(sum(graft.functions.cosine_similarity(col("v"), col("p")))).head()
    joined.select(sum(Similarity.cosineHof(col("v"), col("p")))).head()
    val tNative = time(joined.select(sum(graft.functions.cosine_similarity(col("v"), col("p")))).head().getDouble(0))
    val tHof = time(joined.select(sum(Similarity.cosineHof(col("v"), col("p")))).head().getDouble(0))
    info(f"native: $tNative%.3fs  hof: $tHof%.3fs  speedup: ${tHof / tNative}%.1f×")
    assert(tNative < tHof, f"native ($tNative%.3fs) not faster than HOF ($tHof%.3fs)")
  }

  test("jaro_winkler: textbook values, boost threshold, edge cases, codegen") {
    import spark.implicits._
    val cases = Seq(
      (1L, "martha", "marhta"),      // one transposition
      (2L, "dixon", "dicksonx"),
      (3L, "crate", "trace"),        // jaro > 0.7 but prefix 0 -> no bonus
      (4L, "abcd", "abqqqqqqqqqqqqqqqqqq"), // jaro <= 0.7 -> NO bonus despite prefix
      (5L, "abc", "abc"),
      (6L, "", ""),
      (7L, "", "abc"),
      (8L, "a", "b"))
    val df = cases.toDF("id", "x", "y")
      .select(col("id"),
        (round(graft.functions.jaro_winkler(col("x"), col("y")), 6) + lit(0.0)).as("jw"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(
      1L -> 0.961111, 2L -> 0.813333, 3L -> 0.733333,
      4L -> 0.533333, // threshold variant: 0.626667 would mean bonus leaked below 0.7
      5L -> 1.0, 6L -> 1.0, 7L -> 0.0, 8L -> 0.0))
    // stays inside whole-stage codegen (static-call emission, no
    // fallback) — over a parquet scan, where a Project stage exists
    val plan = Tables.part(spark, sf("sf0.001"))
      .select(graft.functions.jaro_winkler(col("p_name"), lit("small ring")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // null input -> null, not a crash
    val n = Seq((Some("abc"), Option.empty[String])).toDF("x", "y")
      .select(graft.functions.jaro_winkler(col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("jaro_winkler: non-ASCII diverges from DuckDB's byte-level scoring (documented)") {
    // ADVICE r9: we compare UTF-16 code units; DuckDB compares UTF-8
    // BYTES. "café"/"cafe": our view is 4 chars vs 4 chars (m=3,
    // jaro=2.5/3, prefix 3) → 0.883333; DuckDB's byte view is 5 bytes
    // ('é' = 0xC3 0xA9) vs 4 (m=3, jaro=(3/5+3/4+1)/3=0.783333,
    // prefix 3) → 0.848333. This test pins OUR semantic so a future
    // non-ASCII linkage fixture is forced to confront the divergence
    // instead of tripping the oracle hash silently. ASCII inputs are
    // byte==code-unit, hence parity-safe — the linkage fixtures stay
    // ASCII-only by contract (JaroWinkler.scala scaladoc).
    import spark.implicits._
    val jw = Seq(("café", "cafe")).toDF("x", "y")
      .select(graft.functions.jaro_winkler(col("x"), col("y")))
      .head().getDouble(0)
    assert(math.abs(jw - 0.8833333333333333) < 1e-12,
      s"UTF-16-unit jaro_winkler drifted: $jw")
    assert(math.abs(jw - 0.8483333333333334) > 1e-3,
      "matches DuckDB's byte-level value — semantics changed; update the scaladoc contract")
  }
}
