package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Curation, Dedup, Similarity}

/** Degenerate-input behavior: every operator must return a sane EMPTY
  * or singleton result — not throw — on empty corpora, single-row
  * inputs, and edge-free graphs. At 100 TB empty partitions and empty
  * deltas are routine (a new source with no docs yet, a quiet day's
  * delta, a filter that matched nothing); an operator that NPEs on
  * them takes the whole job down. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  private def emptyDocs: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docSchema)
  private def oneDoc: DataFrame =
    Seq((1L, "solitary single document here", "en", "src", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)), StructField("label", IntegerType)))
  private def emptyEmb: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], embSchema)

  test("dedup operators return empty pair sets on an empty corpus") {
    assert(Dedup.nearDupPairs(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, 0.3).count() === 0)
    assert(Dedup.simhashPairs(emptyDocs).count() === 0)
  }

  test("serving indexes tolerate an empty probe batch and an empty corpus build") {
    // r14: an empty delta is the quiet micro-batch every standing
    // ingest gate sees routinely; an empty-corpus build is day zero.
    val base = tempDir("graft_edge_idx")
    Dedup.buildHashIndex(oneDoc, spark, "edge_hash_idx", s"$base/h")
    Dedup.buildBandIndex(oneDoc, spark, "edge_band_idx", s"$base/b")
    Similarity.buildSrpIndex(
      Seq((1L, Array.fill(Similarity.Dim)(0.1f), 0)).toDF("vec_id", "embedding", "label"),
      spark, "edge_srp_idx", s"$base/s")
    try {
      assert(Dedup.probeHashIndex(emptyDocs, spark, "edge_hash_idx").count() === 0)
      assert(Dedup.probeBandIndex(emptyDocs, spark, "edge_band_idx").count() === 0)
      assert(Similarity.probeSrpIndex(emptyEmb, spark, "edge_srp_idx", 3).count() === 0)
      // a non-empty probe against the singleton index still answers
      val hit = Dedup.probeHashIndex(
        oneDoc.select((col("doc_id") + 10L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")), spark, "edge_hash_idx")
      assert(hit.collect().map(r => (r.getString(1), r.getLong(2))).toSeq ===
        Seq(("dup", 1L)))
      // day-zero: empty-corpus indexes build and probe to all-new
      Dedup.buildHashIndex(emptyDocs, spark, "edge_hash_idx0", s"$base/h0")
      Dedup.buildBandIndex(emptyDocs, spark, "edge_band_idx0", s"$base/b0")
      val allNew = Dedup.probeHashIndex(oneDoc, spark, "edge_hash_idx0")
      assert(allNew.collect().map(_.getString(1)).toSeq === Seq("new"))
      assert(Dedup.probeBandIndex(oneDoc, spark, "edge_band_idx0")
        .collect().map(_.getString(1)).toSeq === Seq("new"))
    } finally Seq("edge_hash_idx", "edge_band_idx_bands", "edge_band_idx_toks",
      "edge_srp_idx_bands", "edge_srp_idx_vecs", "edge_hash_idx0",
      "edge_band_idx0_bands", "edge_band_idx0_toks")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("append maintenance tolerates an empty delta and a day-zero base") {
    // r15: the quiet maintenance window (nothing new arrived) and the
    // day-zero gate (index built empty, ALL content arrives as
    // appends) — both must leave the tables probe-correct.
    val base = tempDir("graft_edge_app")
    val twoDocs = oneDoc.select(col("doc_id"), col("text"))
      .unionByName(Seq((2L, "entirely different second text payload"))
        .toDF("doc_id", "text"))
    Dedup.buildHashIndex(oneDoc, spark, "edge_hash_app", s"$base/h")
    Dedup.buildBandIndex(oneDoc, spark, "edge_band_app", s"$base/b")
    Dedup.buildGramIndex(oneDoc, spark, "edge_gram_app", s"$base/g")
    Dedup.buildHashIndex(emptyDocs, spark, "edge_hash_app0", s"$base/h0")
    try {
      // empty-delta appends: no rows enter, probes unchanged
      Dedup.appendHashIndex(emptyDocs, spark, "edge_hash_app")
      Dedup.appendBandIndex(emptyDocs, spark, "edge_band_app")
      Dedup.appendGramIndex(emptyDocs, spark, "edge_gram_app")
      assert(spark.table("edge_hash_app").count() === 1)
      val hit = Dedup.probeHashIndex(
        oneDoc.select((col("doc_id") + 10L).as("doc_id"), col("text")),
        spark, "edge_hash_app")
      assert(hit.collect().map(r => (r.getString(1), r.getLong(2))).toSeq ===
        Seq(("dup", 1L)))
      // day-zero base: everything arrives as appends, probe == rebuild
      Dedup.appendHashIndex(twoDocs, spark, "edge_hash_app0")
      val got = Dedup.probeHashIndex(
        twoDocs.select((col("doc_id") + 10L).as("doc_id"), col("text")),
        spark, "edge_hash_app0").orderBy("doc_id")
        .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(got === Seq(("dup", 1L), ("dup", 2L)),
        s"day-zero appended index must answer like a rebuild: $got")
    } finally Seq("edge_hash_app", "edge_band_app_bands", "edge_band_app_toks",
      "edge_gram_app", "edge_hash_app0")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("dedup operators find no pairs in a single-document corpus") {
    assert(Dedup.nearDupPairs(oneDoc).count() === 0)
    assert(Dedup.ngramJaccardPairs(oneDoc, 0.3).count() === 0)
    assert(Dedup.simhashPairs(oneDoc).count() === 0)
  }

  test("incremental dedup: empty delta yields empty; empty corpus marks everything new") {
    val corpus = oneDoc.select(col("doc_id"), col("text"))
    assert(Dedup.incrementalDedup(corpus, corpus.limit(0)).count() === 0)
    val vsEmpty = Dedup.incrementalDedup(corpus.limit(0), corpus)
      .select("status", "dup_of").as[(String, Long)].collect()
    assert(vsEmpty.toSeq === Seq(("new", -1L)))
  }

  test("connected components (both variants) label an edge-free graph with identities") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    val expect = Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
    assert(Dedup.connectedComponents(nodes, noEdges)
      .as[(Long, Long)].collect().toMap === expect)
    val (labels, rounds) = Dedup.ccStarWithRounds(nodes, noEdges)
    assert(labels.as[(Long, Long)].collect().toMap === expect)
    assert(rounds <= 1, s"empty graph took $rounds alternations")
  }

  test("embedding operators are empty-safe (banding, candidates, batch join)") {
    assert(Similarity.srpBanded(emptyEmb).count() === 0)
    assert(Similarity.srpBandedCandidates(emptyEmb).count() === 0)
    assert(Similarity.nearDupPairsByCosine(emptyEmb, 0.95).count() === 0)
    // empty PROBE set against a non-empty corpus: no retrievals, no throw
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    assert(Similarity.annJoin(emb, emb.limit(0), k = 3).count() === 0)
  }

  test("curation operators are empty-safe") {
    assert(Curation.repetitionSignals(emptyDocs).count() === 0)
    assert(Curation.boilerplateChunks(emptyDocs).count() === 0)
    assert(Curation.decontaminate(emptyDocs, col("doc_id") % 7 === 0).count() === 0)
    assert(Curation.packTokenBins(emptyDocs).count() === 0)
    assert(Curation.stratifiedSample(emptyDocs, Curation.MixRates, 100).count() === 0)
    assert(Curation.trainingReady(emptyDocs, col("doc_id") % 7 === 0,
      minTokens = 1, rates = Curation.MixRates, defaultRate = 100, budget = 512).count() === 0)
  }

  test("null text rows do not break the dedup/curation operators") {
    // a null text is a malformed upstream record — operators must skip
    // it (null tokenization propagates to null, filtered or grouped
    // away), never throw
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "alpha beta gamma", "en", "src", 16L),
        org.apache.spark.sql.Row(2L, null, "en", "src", 0L),
        org.apache.spark.sql.Row(3L, "alpha beta gamma", "en", "src", 16L))),
      docSchema)
    val pairs = Dedup.nearDupPairs(withNull)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)), s"real dup pair lost next to a null row: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "null doc paired")
    assert(Dedup.ngramJaccardPairs(withNull, 0.3).collect().forall(r =>
      r.getLong(0) != 2L && r.getLong(1) != 2L))
    assert(Dedup.simhashPairs(withNull).collect().forall(r =>
      r.getLong(0) != 2L && r.getLong(1) != 2L))
    // curation: the null doc contributes no tokens/chunks
    assert(Curation.boilerplateChunks(withNull).filter(col("doc_id") === 2L).count() <= 1)
    assert(Curation.repetitionSignals(withNull).count() >= 2)
  }

  test("single doc flows through the curation capstone intact") {
    val out = Curation.trainingReady(oneDoc, col("doc_id") < 0,
      minTokens = 1, rates = Seq("en" -> 1000), defaultRate = 1000, budget = 512)
      .collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("start_bin") === 0L)
  }

  test("round-8 operators are empty- and single-doc-safe") {
    // substring spans: nothing is duplicated in 0- or 1-doc corpora
    assert(Dedup.duplicatedSpans(emptyDocs).count() === 0)
    assert(Dedup.duplicatedSpans(oneDoc).count() === 0)
    assert(Dedup.incrementalSubstringSpans(emptyDocs, oneDoc).count() === 0)
    assert(Dedup.incrementalSubstringSpans(oneDoc, oneDoc.limit(0)).count() === 0)
    // tier consensus needs ≥ 2 agreeing tiers — impossible alone
    assert(Dedup.tierAgreement(oneDoc).count() === 0)
    assert(Dedup.tierAgreement(emptyDocs).count() === 0)
    // source overlap: a single source has no pairs
    assert(Curation.sourceOverlap(oneDoc).count() === 0)
    assert(Curation.sourceOverlapSketch(oneDoc).count() === 0)
    // per-lang bucketing: a 1-doc language is its own head, and the
    // gate keeps it (cutoff == its own score, ≥ holds)
    val b = Curation.langQualityBuckets(oneDoc).select("bucket").as[String].head()
    assert(b === "head")
    assert(Curation.langQualityGate(oneDoc).count() === 1)
  }

  test("pageRank handles an edge-free graph: every node gets the uniform rank") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val ranks = Dedup.pageRank(nodes, edges, iters = 3)
      .select("rank_norm").as[Double].collect()
    // no in-edges anywhere → every node holds (1−d)/N, normalized 0.15
    assert(ranks.length === 3 && ranks.forall(r => math.abs(r - 0.15) < 1e-9),
      s"got ${ranks.toSeq}")
  }

  test("subword stats survive unicode and the null row; null text → null struct") {
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "résumé naïve", "fr", "src", 14L),
        org.apache.spark.sql.Row(2L, null, "en", "src", 0L))),
      docSchema)
    val out = withNull.select(col("doc_id"),
        graft.functions.subword_stats(col("text"), Seq("e", "a", "n"), 4).as("s"))
      .select(col("doc_id"), col("s.n_pieces"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) > 0L, "unicode text must segment")
    assert(out(2L) === -1L, "null text must yield a null struct, not a crash")
  }

  test("round-9 operators survive degenerate inputs") {
    // triangles on an empty edge set and on a single edge
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(graft.llm.Dedup.triangleStats(noEdges).count() === 0L)
    val oneEdge = Seq((1L, 2L)).toDF("a", "b")
    assert(graft.llm.Dedup.triangleStats(oneEdge).count() === 0L,
      "degree-1 nodes are excluded (lcc undefined)")
    // fuzzyLink at maxDist = 0 degenerates to exact match on blocked names
    val l = Seq((1L, "alpha beta")).toDF("orig_id", "name")
    val r = Seq((2L, "alpha beta"), (3L, "alpha betX")).toDF("typo_id", "name")
    val exact = graft.queries.Linkage.fuzzyLink(l, r, maxDist = 0).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getInt(2)))
    assert(exact.toSeq === Seq((1L, 2L, 0)))
    // chunk windows: single-token doc → exactly one 1-token window
    val one = graft.llm.TextAnalysis.chunkWindows(
      Seq((1L, "solo")).toDF("doc_id", "text"), window = 32, stride = 16).collect()
    assert(one.map(row => (row.getInt(1), row.getLong(3), row.getString(4))).toSeq
      === Seq((0, 1L, "solo")))
    // equi-depth histogram with more buckets than NDV: one bucket per value
    val tiny = Seq(1.0, 2.0).toDF("v")
    val h = graft.queries.Audit.equiDepthHistogram(tiny, "v", buckets = 8).collect()
    assert(h.length === 2 && h.map(_.getLong(3)).sum === 2L)
    // label propagation with zero edges: every node keeps its own label
    val lone = Seq(7L, 8L).toDF("id")
    val lp = graft.llm.Dedup.labelPropagation(lone, noEdges, iters = 2).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(lp === Map(7L -> 7L, 8L -> 8L))
    // pareto frontier when every row is identical: all co-frontier
    val same = Seq((1L, 5, 9.0), (2L, 5, 9.0), (3L, 5, 9.0))
      .toDF("p_partkey", "p_size", "p_retailprice")
    assert(graft.queries.Relational.paretoFrontier(same).count() === 3L)
    // survival curve of single-day users: one point, everyone at k=0
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 08:00:00")
    val oneDay = Seq((1L, ts("2024-02-01")), (2L, ts("2024-02-01")))
      .toDF("user_id", "ts")
    val sc = graft.queries.EventAnalytics.survivalCurve(oneDay, maxDays = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sc.toSeq === Seq((0L, 2L, 1.0)))
    // frequent sequences: one user with exactly 3 events → one trigram
    val three = Seq((1L, 1L, ts("2024-02-01"), "a"), (2L, 1L, ts("2024-02-02"), "b"),
      (3L, 1L, ts("2024-02-03"), "c")).toDF("event_id", "user_id", "ts", "event_type")
    val fs = graft.queries.EventAnalytics.frequentSequences(three, 5).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(fs.toSeq === Seq(("a>b>c", 1L)))
  }

  test("round-10 operators survive degenerate inputs") {
    // preSplitAtDayBoundaries: empty frame → empty; inverted interval
    // dropped; single-instant interval → one 1-µs piece on its day
    val noIv = Seq.empty[(Long, Long, Long)].toDF("user_id", "s", "e")
    assert(graft.operators.RangeJoin.preSplitAtDayBoundaries(noIv).count() === 0L)
    val bad = Seq((1L, 100L, 50L)).toDF("user_id", "s", "e")
    assert(graft.operators.RangeJoin.preSplitAtDayBoundaries(bad).count() === 0L,
      "inverted interval must be dropped, not exploded")
    val point = Seq((1L, 86400000000L, 86400000000L)).toDF("user_id", "s", "e")
    val p = graft.operators.RangeJoin.preSplitAtDayBoundaries(point).collect()
    assert(p.length === 1 &&
      p.head.getAs[java.sql.Date]("day").toString === "1970-01-02")
    // minhashRecall: empty corpus and probe-free corpus both yield an
    // empty report (no NPE, no ghost rows)
    assert(Dedup.minhashRecall(emptyDocs.select(col("doc_id"), col("text")),
      probePred = col("doc_id") < 5).count() === 0L)
    assert(Dedup.minhashRecall(oneDoc.select(col("doc_id"), col("text")),
      probePred = col("doc_id") < 0).count() === 0L)
    // minhashTruthCandidates: maxDf = 0 stops every token — empty, not a crash
    val toks = Dedup.tokenized(oneDoc.select(col("doc_id"), col("text")))
    assert(Dedup.minhashTruthCandidates(toks, col("doc_id") === 1L, maxDf = 0)
      .count() === 0L)
    // windowedFunnel on an empty/seedless stream: every stage reports
    // ZERO users (not a NULL row), one row per step
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    val wf = graft.queries.EventAnalytics.windowedFunnel(
      noEvents, Seq("signup", "view"), 3600L * 1000000).collect()
    assert(wf.length === 2 && wf.forall(_.getLong(1) === 0L),
      s"empty funnel must report zeros: ${wf.mkString(",")}")
  }

  test("round-10 session-2 operators survive degenerate inputs") {
    val docIdText = emptyDocs.select(col("doc_id"), col("text"))
    // CDC chunking: empty corpus → no chunks in all three forms; a
    // single doc chunks with every fingerprint unshared
    assert(Dedup.contentChunks(docIdText).count() === 0L)
    assert(Dedup.contentChunksComposed(docIdText).count() === 0L)
    assert(Dedup.contentChunkRows(docIdText).count() === 0L)
    val one = Dedup.contentChunks(oneDoc.select(col("doc_id"), col("text"))).collect()
    assert(one.nonEmpty && one.forall(_.getLong(5) === 1L))
    // novelty: empty corpus → empty; one doc owns all its grams
    assert(Dedup.gramNovelty(docIdText).count() === 0L)
    val nv = Dedup.gramNovelty(
      Seq((1L, (1 to 10).map("t" + _).mkString(" "))).toDF("doc_id", "text")).collect()
    assert(nv.length === 1 && nv.head.getDouble(3) === 1.0)
    // source matrix: empty corpus → empty matrix (the LSH feeds it)
    assert(SparkEntryTestAccess.sourceMatrix(emptyDocs).count() === 0L)
    // conjunctive search: no doc carries an absent term; empty corpus safe
    assert(graft.llm.TextAnalysis.conjunctiveSearch(
      emptyDocs, Seq("a"), 5).count() === 0L)
    assert(graft.llm.TextAnalysis.conjunctiveSearch(
      oneDoc, Seq("solitary", "absent_term"), 5).count() === 0L)
    // zipf: empty corpus → the degenerate one-row fit (documented
    // contract: slope NULL, no throw)
    val zs = graft.llm.TextAnalysis.zipfSlope(docIdText).collect()
    assert(zs.length === 1 && zs.head.getLong(0) === 0L && zs.head.isNullAt(1))
    // fd audit: empty frame → empty profile
    assert(graft.queries.Audit.fdAudit(
      Seq.empty[(String, String)].toDF("a", "b")).count() === 0L)
    // peaks: empty events and a 2-event series (no interior) → empty
    val noEv = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("event_id", "ts", "user_id", "value")
    assert(graft.queries.TimeSeries.peakDetection(noEv).count() === 0L)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val twoEv = Seq((1L, t0, 1L, 1.0),
      (2L, new java.sql.Timestamp(t0.getTime + 1000), 1L, 9.0))
      .toDF("event_id", "ts", "user_id", "value")
    assert(graft.queries.TimeSeries.peakDetection(twoEv).count() === 0L,
      "a 2-event series has no interior and no peaks")
  }

  test("round-10 session-4 operators survive degenerate inputs") {
    import graft.queries.{Audit, Graphs}
    // common neighbors: empty edge set → empty; a single edge has no
    // wedge (both endpoints deg 1)
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graphs.commonNeighbors(noEdges, maxDeg = 10, k = 5).count() === 0L)
    assert(Graphs.commonNeighbors(
      Seq((1L, 2L)).toDF("a", "b"), maxDeg = 10, k = 5).count() === 0L)
    // corrMatrix: a CONSTANT column has zero variance → correlation
    // undefined → NULL (the guard matters: ANSI-mode double division
    // by zero THROWS in Spark 4, so an unguarded divide would take
    // the whole job down on a degenerate frame)
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    val cm = Audit.corrMatrix(const, Seq("x", "y")).collect()
    assert(cm.length === 1 && cm.head.isNullAt(3))
    // spearman: same contract through the rank transform (a constant
    // column ranks to one tied value — still zero variance)
    val sm = Audit.spearmanMatrix(const, Seq("x", "y")).collect()
    assert(sm.length === 1 && sm.head.isNullAt(3))
    // target encoding: a single fold means EVERY row's own fold is
    // excluded → the exclusion frame is empty and the encoding
    // collapses to the pure prior α·P/(N·α) = P/N
    val oneFold = Seq(("A", 0L, 1L), ("A", 0L, 0L), ("B", 0L, 1L))
      .toDF("seg", "fold", "y")
    val te = graft.pipeline.TrainingData.targetEncodeFolds(oneFold, alpha = 10)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(te.forall(r => math.abs(r._5 - 2.0 / 3.0) < 1e-12),
      s"single-fold encoding must equal the global prior: ${te.toSeq}")
    // bm25: empty corpus → empty ranking; all-absent terms → empty
    assert(graft.llm.TextAnalysis.bm25Search(
      emptyDocs, Seq("a"), 5).count() === 0L)
    assert(graft.llm.TextAnalysis.bm25Search(
      oneDoc, Seq("absent_term"), 5).count() === 0L)
    // per-fold AUC: a fold with one class only → AUC undefined →
    // NULL, counts still exact (the caller reads n_pos/n_neg before
    // trusting auc)
    val oneClass = Seq((0.3, 1, 0L), (0.7, 1, 0L)).toDF("score", "label", "fold")
    val auc = Audit.exactAucByFold(oneClass).collect()
    assert(auc.length === 1 && auc.head.getLong(1) === 2L &&
      auc.head.getLong(2) === 0L && auc.head.isNullAt(3))
    // seasonal-naive backtest shape: a series shorter than one season
    // produces no backtest rows (nothing to join at lag 7) — pinned
    // through the declared query's daily-join shape on a 2-day frame
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val shortEv = Seq(
      (1L, t1, 1L, "view", 1.0, ""),
      (2L, new java.sql.Timestamp(t1.getTime + 86400000L), 1L, "view", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val daily = shortEv.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val lagJoin = daily.join(
      daily.select(col("user_id").as("u2"), col("day").as("d2")),
      col("user_id") === col("u2") && col("d2") === date_sub(col("day"), 7))
    assert(lagJoin.count() === 0L)
  }

  test("round-12 operators survive degenerate inputs") {
    import graft.llm.Retrieval
    import graft.queries.Sketches
    // RRF on an empty corpus+index: both retriever lists are empty and
    // the fused list is too — no head() on a missing probe, no NaN
    assert(Retrieval.rrfFusion(emptyDocs, emptyEmb,
      Seq("spark"), probeId = 0L, n = 50, k = 20).count() === 0L)
    // MMR with an empty index: the greedy loop gets no candidates and
    // returns a typed empty frame; with fewer candidates than k it
    // returns them all, ranked
    assert(Retrieval.mmrRerank(spark, emptyEmb, 0L, nCand = 20, k = 8).count() === 0L)
    val threeVecs = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0), (2L, Seq(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val picked = Retrieval.mmrRerank(spark, threeVecs, 0L, nCand = 20, k = 8)
    assert(picked.count() === 3L)
    // temperature mix: empty corpus → empty selection (no ANSI
    // null-div throw from the null totals row); one source gets the
    // whole half-corpus quota
    assert(Retrieval.temperatureMix(emptyDocs).count() === 0L)
    val oneSrc = (1L to 10L).map(i => (i, s"doc $i", "en", "only", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mixed = Retrieval.temperatureMix(oneSrc)
    assert(mixed.count() === 5L) // n_total div 2, single source keeps all of it
    // HLL: empty input → empty register table and an empty estimate
    // frame (the grid has no groups to fill); a 1-key input reads the
    // RAW estimator's documented small-range floor ≈ α·m ≈ 0.72·256
    // (no linear-counting correction by design — libm ban), with
    // n_zero_regs = m−1 lighting the regime diagnostic exactly as the
    // scaladoc promises
    assert(Sketches.hllDistinct(emptyDocs, "source", "doc_id").count() === 0L)
    val one = Sketches.hllDistinct(oneDoc, "source", "doc_id").collect()
    assert(one.length === 2) // the group and its *ALL* merge
    one.foreach { r =>
      assert(r.getAs[Long]("n_exact") === 1L)
      assert(r.getAs[Long]("n_zero_regs") === (Sketches.HllM - 1).toLong)
      val est = r.getAs[Double]("hll_est")
      assert(est > 150 && est < 200, s"1-key raw estimate should sit at ~alpha*m: $est")
    }
  }

  test("round-12 session-5 operators survive degenerate inputs") {
    import graft.llm.{Multimodal, Retrieval, Similarity, TextAnalysis}
    import graft.pipeline.{Telemetry, TrainingData}
    import graft.queries.{Audit, TimeSeries}
    val emptyEvents = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("event_id", LongType),
        StructField("user_id", LongType),
        StructField("ts", TimestampType), StructField("value", DoubleType))))
    // conformal: an empty frame (and a frame with no calibration rows)
    // yields an EMPTY report — q̂ does not exist, nothing to cover
    val emptyCp = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("split", StringType),
        StructField("grp", LongType), StructField("cents", LongType))))
    assert(TrainingData.conformalReport(emptyCp, 900000L).count() === 0L)
    assert(TrainingData.conformalReport(
      Seq(("train", 1L, 100L), ("test", 1L, 90L)).toDF("split", "grp", "cents"),
      900000L).count() === 0L)
    // IR eval / matryoshka on an empty index: no probes, no rows
    assert(Retrieval.evalMetrics(emptyEmb, nProbes = 8, k = 10).count() === 0L)
    assert(Similarity.matryoshkaAudit(emptyEmb, nProbes = 8, k = 10,
      dims = Seq(8, 16)).count() === 0L)
    // trend tests: empty series and the no-pairs singleton vanish
    assert(TimeSeries.theilSenSlope(emptyEvents).count() === 0L)
    assert(TimeSeries.mannKendall(emptyEvents).count() === 0L)
    // privacy audits: empty relation → empty report
    val emptyQi = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("g", StringType), StructField("sens", StringType),
        StructField("j", LongType))))
    assert(Audit.lDiversity(emptyQi, Seq("g"), "sens").count() === 0L)
    assert(Audit.tCloseness(emptyQi, Seq("g"), "j").count() === 0L)
    // token entropy: empty corpus → EMPTY report (no NULL *ALL* row)
    assert(TextAnalysis.tokenEntropy(emptyDocs).count() === 0L)
    // phash: empty and singleton corpora pair nothing; two 1-char
    // payloads hash to the all-zero word and pair at Hamming 0 (equal
    // constant signals ARE duplicates)
    assert(Multimodal.phashPairs(emptyDocs, maxHam = 6).count() === 0L)
    assert(Multimodal.phashPairs(oneDoc.select(col("doc_id"), col("text")),
      maxHam = 6).count() === 0L)
    val tiny = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val tinyGot = Multimodal.phashPairs(tiny, maxHam = 6).collect()
    assert(tinyGot.length === 1 && tinyGot.head.getAs[Long]("hamming") === 0L)
    // isotonic: empty bins → empty fit; a single bin is its own rate
    val emptyBins = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("bucket", LongType), StructField("n", LongType),
        StructField("n_pos", LongType))))
    assert(Telemetry.isotonicCalibration(emptyBins).count() === 0L)
    val oneBin = Telemetry.isotonicCalibration(
      Seq((0L, 4L, 1L)).toDF("bucket", "n", "n_pos")).collect()
    assert(oneBin.length === 1 && oneBin.head.getAs[Double]("iso_cal") === 0.25)
  }

  test("round-13 operators survive degenerate inputs") {
    import graft.llm.Multimodal
    import graft.pipeline.Telemetry
    import graft.queries.Graphs
    // threshold metrics on an empty scored frame: the global aggregate
    // still emits its one row — counts NULL, ratio metrics at their
    // documented sentinels (0.0 for precision/recall/f1, −1 for the
    // marginal-dependent ones), never NaN or a divide error
    val emptyScored = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("alert", IntegerType),
        StructField("failure_next", IntegerType))))
    val tm = Telemetry.thresholdMetrics(emptyScored).collect()
    assert(tm.length === 1)
    assert(tm.head.isNullAt(tm.head.fieldIndex("tp")))
    assert(tm.head.getAs[Double]("f1") === 0.0)
    assert(tm.head.getAs[Double]("mcc") === -1.0)
    // calibration error on an empty frame: no bins, empty report (the
    // bounds row exists but joins against nothing)
    val emptyCal = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("value_mean_7", DoubleType),
        StructField("failure_next", IntegerType))))
    assert(Telemetry.calibrationError(emptyCal).count() === 0L)
    // k-core trace on an edge-free graph: every level reports 0
    // survivors — the trace stays total (one row per level), it never
    // collapses to an empty frame
    val emptyEdges = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    val trace = Graphs.kCoreTrace(emptyEdges, k = 2, iters = 3).collect()
    assert(trace.map(_.getAs[Long]("iter")).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(trace.forall(_.getAs[Long]("n_nodes") === 0L))
    // decode pin: empty corpus → empty; empty-text row → all-zero
    // features with an empty head (sequence(1,0) would DESCEND in
    // Spark — the guard is what this pins)
    assert(Multimodal.decodeFeaturesPinned(emptyDocs).count() === 0L)
    val pin = Multimodal.decodeFeaturesPinned(
      Seq((1L, ""), (2L, "ab")).toDF("doc_id", "text")).collect()
    assert(pin(0).getAs[Long]("n_bytes") === 0L)
    assert(pin(0).getAs[Long]("byte_sum") === 0L)
    assert(pin(0).getAs[Long]("mean_byte_micro") === 0L)
    assert(pin(0).getAs[String]("head_hex") === "")
    assert(pin(1).getAs[Long]("byte_sum") === ('a'.toInt + 'b'.toInt).toLong)
    assert(pin(1).getAs[String]("head_hex") === "6162")
    // salted join on an empty fact side: empty result, no divide/explode
    // faults from the salt machinery
    val emptyFact = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))))
    val tinyDim = Seq((1L, 10L), (2L, 20L)).toDF("dk", "p")
    assert(graft.operators.Salted.joinSalted(
      emptyFact, tinyDim, "k", "dk", saltSource = Seq("v")).count() === 0L)
    // bench hot-key re-key: exactly the event_id % 5 == 0 rows move to
    // user −1, everyone else keeps their user (the published hot_frac
    // in the BENCH skew block depends on this staying exact)
    val ev = (0L until 20L).map(i => (i, i % 7)).toDF("event_id", "user_id")
    val keyed = Bench.hotKeyed(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("user_id")).toMap
    (0L until 20L).foreach { i =>
      if (i % 5 == 0) assert(keyed(i) === -1L, s"event $i should be hot")
      else assert(keyed(i) === i % 7, s"event $i should keep its user")
    }
  }

  test("round-16 incremental refresh survives degenerate inputs") {
    val embOne = Seq((1L, Array.fill(8)(0.5f), 0)).toDF("vec_id", "embedding", "label")
    val emptyDelta = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val emptyDeltaEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
    // a quiet day's delta: empty batch over a real corpus → empty
    // verdict frame, no tier throws (the seeds/eval-gram derivations
    // still run against the corpus)
    assert(Curation.incrementalRefresh(
      oneDoc, embOne, emptyDelta, emptyDeltaEmb,
      evalPred = col("doc_id") % 7 === 0).count() === 0L)
    // day-zero: EMPTY corpus, first batch arrives → every probe tier
    // finds nothing (zero seeds, zero grams, empty hash/band indexes);
    // the verdict is decided by the token gate alone
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], embSchema)
    val delta = Seq(
      (1L, "a perfectly ordinary novel arriving document"),
      (2L, "tiny stub")).toDF("doc_id", "text")
    val deltaEmb = Seq(
      (1L, Seq.fill(8)(0.25)), (2L, Seq.fill(8)(0.75))).toDF("vec_id", "v")
    val dayZero = Curation.incrementalRefresh(
        emptyDocs, emptyEmb, delta, deltaEmb, evalPred = lit(false))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(dayZero(1L) === (("train", -1L)))
    assert(dayZero(2L) === (("low_quality", -1L)))
    // a delta doc with NO embedding row: the sem tier simply never
    // fires for it (left-join cascade), the other tiers still decide
    val noEmb = Curation.incrementalRefresh(
        oneDoc, embOne, Seq((9L, "solitary single document here")).toDF("doc_id", "text"),
        emptyDeltaEmb, evalPred = lit(false))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(noEmb(9L) === (("exact_dup", 1L)))
  }

  test("round-17 cascade stage 0 survives degenerate batch shapes") {
    val embOne = Seq((1L, Array.fill(8)(0.5f), 0)).toDF("vec_id", "embedding", "label")
    val emptyDeltaEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))))
    // a batch that is ENTIRELY one text under five ids: the min-id
    // victor alone continues the cascade (novel + long enough →
    // train); every other copy reads exact_dup OF THE VICTOR
    val monoBatch = (10L to 14L)
      .map(i => (i, "five identical copies of one arriving document"))
      .toDF("doc_id", "text")
    val mono = Curation.incrementalRefresh(
        oneDoc, embOne, monoBatch, emptyDeltaEmb, evalPred = lit(false))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(mono(10L) === (("train", -1L)))
    for (i <- 11L to 14L)
      assert(mono(i) === (("exact_dup", 10L)), s"copy $i: ${mono(i)}")
    // twins of a CORPUS doc: the victor defers to the corpus keep_id
    // (stage 0 never fires for a victor), the copy to the victor —
    // batch-local attribution stays batch-local
    val corpusTwins = Seq(
      (20L, "solitary single document here"),
      (21L, "solitary single document here")).toDF("doc_id", "text")
    val tw = Curation.incrementalRefresh(
        oneDoc, embOne, corpusTwins, emptyDeltaEmb, evalPred = lit(false))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(tw(20L) === (("exact_dup", 1L)))
    assert(tw(21L) === (("exact_dup", 20L)))
    // a single-doc batch: stage 0 is a no-op (the doc is its own
    // victor) — no self-dup verdict can originate from stage 0
    val solo = Curation.incrementalRefresh(
        oneDoc, embOne,
        Seq((30L, "another wholly novel arriving document")).toDF("doc_id", "text"),
        emptyDeltaEmb, evalPred = lit(false))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(solo(30L) === (("train", -1L)))
  }

  test("split/label tier: all-singleton corpus, one all-spanning group, group-merging append (r18)") {
    // VERDICT r17 task 6 — the r17 split/label tier's degenerate
    // shapes. (1) EMPTY pair set: every doc is a singleton, so
    // groupAwareSplit must equal hashSplit EXACTLY — rule identity per
    // row, not merely zero leaks — and each group_id is the doc's own
    // id.
    val docs = (1L to 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val singletons = Curation.groupAwareSplit(docs, emptyPairs)
      .select("doc_id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val perDoc = Curation.hashSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(singletons.size === 40)
    for ((id, (gid, sp)) <- singletons) {
      assert(gid === id, s"singleton $id must label as itself, got $gid")
      assert(sp === perDoc(id), s"singleton $id must keep its hashSplit assignment")
    }
    // ...and an empty CORPUS doesn't hang the CC loop
    assert(Curation.groupAwareSplit(docs.limit(0), emptyPairs).count() === 0)

    // (2) ONE group spanning every doc: a single label (the min id),
    // a single split for all 40 — the whole corpus rides one bucket
    // decision, which is exactly the no-leak guarantee at its extreme
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val giant = Curation.groupAwareSplit(docs, chain)
      .select("doc_id", "group_id", "split").collect()
    assert(giant.map(_.getLong(1)).toSet === Set(1L),
      "an all-spanning group must carry the min-id label everywhere")
    assert(giant.map(_.getString(2)).toSet.size === 1,
      "an all-spanning group must land in exactly one split")
    assert(giant.map(_.getString(2)).head === perDoc(1L),
      "the group routes by the hash of its min-id label")

    // (3) an append batch whose DELTA COMPONENT merges two standing
    // groups: docs 10–11 are one delta component, 10 touches group
    // {1,2} and 11 touches group {5,6} — attach-only cannot merge
    // corpus groups, so both adopt the MIN standing label and the
    // pending-merge refit signal fires (count 1)
    val tbl = "edge_glbl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val p = tempDir("edge_glbl")
    Dedup.buildGroupLabels(
      Seq(1L, 2L, 5L, 6L).toDF("id"),
      Seq((1L, 2L), (5L, 6L)).toDF("a", "b"), spark, tbl, s"$p/$tbl")
    try {
      val pending = Dedup.appendGroupLabels(
        Seq(10L, 11L).toDF("id"),
        Seq((10L, 11L), (2L, 10L), (6L, 11L)).toDF("a", "b"), spark, tbl)
      assert(pending === 1L,
        s"a group-merging delta component must fire the refit signal, got $pending")
      val labels = spark.table(tbl).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels(10L) === 1L && labels(11L) === 1L,
        s"merged-component docs must adopt the min standing label: $labels")
      assert(labels(5L) === 5L,
        "attach-only must not rewrite the standing corpus labels")
      // (3b) an EMPTY delta is the quiet micro-batch: no pending, no rows
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType))))
      val emptyEdges = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
      assert(Dedup.appendGroupLabels(empty, emptyEdges, spark, tbl) === 0L)
      assert(spark.table(tbl).count() === 6L, "empty append must write nothing")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}

/** The source-matrix pipeline is declared inline; rebuild its core here
  * so the edge test exercises the same shape without an SF directory. */
private object SparkEntryTestAccess {
  import org.apache.spark.sql.functions._
  def sourceMatrix(docs: DataFrame): DataFrame = {
    val pairs = graft.llm.Dedup.nearDupPairs(docs.select(col("doc_id"), col("text")))
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
