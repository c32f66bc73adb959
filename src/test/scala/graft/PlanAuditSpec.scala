package graft

/** Plan-shape regression gate (VERDICT r10 task 6): the AQE-final
  * exchange counts PLANS.md's audit tables record for the expensive
  * composites were measured prose until this spec — a Spark upgrade,
  * an AQE threshold drift, or a careless refactor could silently
  * re-introduce the multi-consumer re-scan plans the audits caught
  * (windowed funnel 8→1, common-neighbors 8→3, target-encode 6→3,
  * Q20 5→3) and nothing would fail until something got slow.
  *
  * Gate form: for each audited query, at sf0.01 (the scale the
  * PLANS.md numbers were recorded at),
  *   shuffles ≤ SH   and   shuffles + broadcasts ≤ SH + BC.
  * The joint bound tolerates AQE's legitimate shuffle→broadcast flips
  * (a flip trades one shuffle for one broadcast, so the total never
  * grows) while still failing LOUD on any plan that adds an exchange
  * on either axis. Bounds are the recorded values, not aspirations —
  * tightening one requires re-measuring, loosening one is a reviewed
  * regression.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = sf("sf0.01")

  /** name → (shuffles, broadcasts) as recorded in PLANS.md's
    * session-4 audit tables (TPC-H shapes + retrieval/statistics tier
    * + continuation sweep) and VERDICT r10's market-share audit. */
  private val recorded: Map[String, (Int, Int)] = Map(
    "analytics_order_count_distribution" -> ((3, 1)),
    "analytics_large_orders" -> ((1, 2)),
    "analytics_dnf_revenue" -> ((1, 1)),
    "join_semi_agg_threshold" -> ((3, 2)),
    // (4, 5) not (3, 5): AQE sometimes materializes the o_custkey
    // sort-merge shuffle stage BEFORE deciding to flip that join to
    // broadcast, and then builds the broadcast FROM the already-
    // materialized shuffle output — the exchange stays in the executed
    // plan as the broadcast's input. Timing-dependent: measured 4/5 on
    // a cold session's first run and 3/5 on warm reruns (r13). The
    // extra exchange is AQE's flip artifact, not a plan regression.
    "analytics_nation_volume" -> ((4, 5)),
    "analytics_profit_by_nation" -> ((2, 3)),
    "analytics_local_volume" -> ((2, 4)),
    // r21 re-measure (was (3, 2)): the one-tokenization-pass rewrite
    // moved bm25's localCheckpoint from the (doc, term) tf frame UP to
    // the per-doc (doc_id, dl, matched-tokens) frame, so the gate now
    // SEES the totals and tf aggregates the old checkpoint hid — the
    // query's total exchange count is unchanged (totals agg + tf agg +
    // df agg + score agg + the 1-row broadcast pair) while the corpus
    // text is scanned and split ONCE instead of twice (guide §6).
    "search_bm25_topk" -> ((5, 2)),
    "audit_corr_matrix" -> ((1, 0)),
    "ml_chi2_independence" -> ((4, 3)),
    "graph_common_neighbors" -> ((3, 4)),
    "ml_target_encode" -> ((3, 2)),
    "events_ohlc_bars" -> ((2, 0)),
    "audit_spearman_corr" -> ((1, 0)),
    "analytics_shipping_priority" -> ((1, 2)),
    "agg_mixed_distinct" -> ((3, 0)),
    "analytics_market_share" -> ((3, 3)),
    // r11: the Q12 analog — measured at sf0.01: AQE broadcasts the
    // year+flag-pruned lineitem side into the orderkey join, plus the
    // conditional-count agg and output-sort exchanges on the 2-row
    // tail; at 100 TB the join reverts to a keyed shuffle (the
    // market-share pattern) and the joint bound still holds
    "analytics_shipmode_classes" -> ((2, 1)),
    // r12 retrieval composition tier (measured at sf0.01): RRF = the
    // BM25 pass's exchanges + the two n-bounded rank windows and the
    // fusion join (AQE broadcasts the 50-row frames); MMR = the one
    // cosine top-k exchange (the greedy is driver-side over bounded
    // collects); temperature mix = src count agg + totals agg + the
    // source-partitioned rank window + quota join + output sort, all
    // small except the window and the count, each data-sized once
    // r21: (3, 3) -> (5, 3) for the same reason as search_bm25_topk —
    // the BM25 leg's earlier checkpoint exposes its totals/tf
    // aggregates to the gate; the fused plan's exchange total and the
    // n-bounded fusion tail are unchanged, the corpus scan count drops
    "search_rrf_fusion" -> ((5, 3)),
    "search_mmr_rerank" -> ((1, 0)),
    "curation_temperature_mix" -> ((5, 2)),
    // r12 tail (measured at sf0.01): HLL's 8 includes the exact-count
    // audit baselines (two extra data-sized aggregates you would drop
    // at 100 TB — the register build itself is ONE data-sized
    // exchange); topic terms = docs⋈topics join + tf agg + df
    // distinct/agg + rank window + sort; the front doors are scan +
    // recursion/extract + rollup + sort
    "sketch_hll_distinct" -> ((8, 3)),
    "corpus_topic_terms" -> ((6, 2)),
    "sql_frontdoor_recursive" -> ((2, 0)),
    "ingest_variant_extract" -> ((2, 0)),
    // hard negatives = anchor broadcast + rank window + output sort;
    // the Holt folds = (user, day) agg + per-user collect + sort —
    // the whole recurrence rides inside one row, no per-step exchange
    "curation_hard_negatives" -> ((2, 1)),
    "timeseries_holt_backtest" -> ((3, 0)),
    "timeseries_holt_winters" -> ((3, 0)),
    // r12 session 5 (measured at sf0.01): conformal = split scan +
    // part-keyed train agg + score histogram + output rollup, q̂ and
    // gpred riding broadcast 1-row frames; the trend pair = the
    // (user, day) agg + pair-join + rank/tie rollups, all user-keyed;
    // t-closeness = cells agg + the grid/cum machinery on bounded
    // frames; entropy = explode agg + two rollups + union sort;
    // phash = the fingerprint scan (map-only — checkpointed) + band
    // join + verify joins (AQE broadcasts the pair frames); isotonic
    // collapsed 11→3 by checkpointing the bins input (the telemetry
    // upstream ran 3× before)
    "ml_conformal_interval" -> ((4, 2)),
    "search_eval_metrics" -> ((3, 2)),
    "timeseries_theilsen_slope" -> ((3, 2)),
    "timeseries_mann_kendall" -> ((4, 2)),
    "audit_l_diversity" -> ((3, 1)),
    "audit_t_closeness" -> ((6, 3)),
    "text_token_entropy" -> ((4, 0)),
    "multimodal_phash_pairs" -> ((2, 3)),
    "embed_matryoshka_prefix" -> ((2, 1)),
    "ml_isotonic_calibration" -> ((3, 3)),
    // BQ recall: the checkpointed word/cosine pass + two rank windows
    // + the reference join (AQE broadcasts the k-bounded exact list)
    "embed_bq_recall" -> ((3, 1)),
    // r13 (measured at sf0.01): the skew-resistant chunked window —
    // the label window + the documented two (user, chunk) exchanges +
    // offsets window + context-ship join + final sort; AQE broadcasts
    // the tiny offsets/dests frames. The gate protects the operator's
    // reason to exist: SkewProbe measured its hottest-task bound (one
    // user-week vs one user-history) only holds while the plan keeps
    // the (user, chunk) keying — an extra data-sized exchange here
    // means the rewrite regressed toward the single-partition form.
    "telemetry_features_chunked" -> ((9, 3)),
  )

  recorded.foreach { case (name, (sh, bc)) =>
    test(s"$name: shuffles <= $sh and exchanges <= ${sh + bc}") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val (gotSh, gotBc) = PlanAudit.exchangeCounts(df)
      assert(gotSh <= sh,
        s"$name shuffle count regressed: $gotSh > recorded $sh (broadcasts $gotBc)")
      assert(gotSh + gotBc <= sh + bc,
        s"$name total exchanges regressed: $gotSh+$gotBc > recorded $sh+$bc")
    }
  }

  // The scaladoc's headline motivating regression — windowed funnel
  // 8→1 — is not name-addressable through SparkEntry.queries (the
  // public API localCheckpoints, hiding the chained-join pipeline
  // behind a checkpoint scan), so the map above cannot gate it
  // (ADVICE r11). Gate the un-checkpointed core directly: ONE
  // user-keyed exchange paid up front (the event repartition), every
  // step filter/join/min-combine reusing that partitioning — the
  // first-draft plan re-exchanged the event side per step (8 shuffles
  // at 4 steps). Measured at sf0.01: 1 shuffle, 10 broadcasts — AQE
  // flips the (user-bounded, steps-deep) chain frames to broadcast
  // joins at this scale; at 100 TB those revert to keyed joins that
  // are already co-partitioned on user_id, so the shuffle count — the
  // axis the 8→1 fix was about — still holds at 1.
  test("windowedFunnel core: shuffles <= 1 and exchanges <= 11") {
    val (core, ev) = queries.EventAnalytics.windowedFunnelPlan(
      Tables.events(spark, sfDir),
      Seq("signup", "view", "click", "purchase"), 72L * 3600 * 1000000)
    try {
      val (gotSh, gotBc) = PlanAudit.exchangeCounts(core)
      assert(gotSh <= 1,
        s"funnel core shuffle count regressed: $gotSh > 1 (broadcasts $gotBc)")
      assert(gotSh + gotBc <= 11,
        s"funnel core total exchanges regressed: $gotSh+$gotBc > 11")
    } finally ev.unpersist(blocking = true)
  }

  // r13: shuffle VOLUME gates (PlanAudit.shuffleStats) — counts bound
  // how many barriers a plan pays; these bound what the barriers MOVE,
  // which is the wire cost at 100 TB. A payload column accidentally
  // carried through an exchange (the regression class counts cannot
  // see: same exchange count, 10× the bytes) fails here. Record
  // bounds: measured at sf0.01 (ShuffleProbe, PLANS.md r13 table) —
  // records are plan-determined and gated tight; bytes are serialized
  // sizes and get ~2× headroom for codec/platform drift.
  private val volumeGates: Map[String, (Long, Long)] = Map(
    // query -> (max shuffle records, max shuffle bytes)
    "telemetry_features" -> ((25000L, 1500000L)),  // measured 17986 / 0.64 MB
    "join_fact_fact" -> ((35000L, 1000000L)),      // measured 29486 / 0.44 MB
    "events_ohlc_bars" -> ((17000L, 800000L)),     // measured 14006 / 0.35 MB
    "dedup_exact" -> ((2000L, 150000L)),           // measured 1500 / 0.06 MB
  )
  volumeGates.foreach { case (name, (maxRecs, maxBytes)) =>
    test(s"$name: shuffle volume <= $maxRecs rows / $maxBytes bytes") {
      val (sb, srec, _) = PlanAudit.shuffleStats(SparkEntry.queries(name)(spark, sfDir))
      assert(srec <= maxRecs,
        s"$name shuffled $srec records > $maxRecs — a stage stopped pre-aggregating?")
      assert(sb <= maxBytes,
        s"$name shuffled $sb bytes > $maxBytes — a payload column entered an exchange?")
    }
  }

  // r14: pre-checkpoint CORE volume gates (VERDICT r13 task 1) — the
  // LSH pair tier and the curation capstone persist/localCheckpoint
  // mid-pipeline, so the query-addressable gates above can only see
  // their post-checkpoint tails; these run the package-private *Plan
  // variants (identical exchange volumes — persistence only dedups
  // map-side derivation). Broadcast joins are disabled for the
  // measurement: at sf0.01 AQE flips the band/verify joins to
  // broadcast and the wire volume hides in broadcast bytes, while at
  // 100 TB neither side fits a broadcast and every one of those joins
  // is the keyed shuffle gated here. Pair cores run on Bench's
  // planted LSH fixture (what Bench times; the raw corpus is
  // vocabulary-dense and its candidate set degenerates to all-pairs).
  // Measured r14 at sf0.01 (ShuffleProbe "[sj]" rows): minhash
  // 2725 / 0.23 MB, ngram 3775 / 0.51 MB, simhash 11061 / 0.14 MB,
  // ann 2820 / 0.24 MB, capstone 26455 / 0.44 MB. Records gated with
  // ~25% headroom (plan/data-determined), bytes ~2× (serialized sizes
  // drift with codec/platform).
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.col

  private def withShuffleJoins[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
  private lazy val fixtureDocs: DataFrame =
    Tables.documents(spark, Bench.lshFixtureCached(spark, sfDir))

  private val coreVolumeGates: Seq[(String, () => DataFrame, Long, Long)] = Seq(
    ("core:dedup_minhash_pairs",
      () => llm.Dedup.nearDupPairsPlan(fixtureDocs), 3500L, 500000L),
    ("core:dedup_ngram_jaccard",
      () => llm.Dedup.ngramJaccardPairsPlan(fixtureDocs, 0.3), 4800L, 1100000L),
    ("core:dedup_simhash_pairs",
      () => llm.Dedup.simhashPairsPlan(fixtureDocs), 14000L, 300000L),
    ("core:embed_ann_join",
      () => {
        val emb = Tables.embeddings(spark, sfDir)
        llm.Similarity.annJoinPlan(emb, emb.filter(col("vec_id") < 8), 3)
      }, 3600L, 500000L),
    ("core:corpus_training_ready",
      () => llm.Curation.trainingReadyPlan(
        Tables.documents(spark, sfDir), col("doc_id") % 7 === 0,
        minTokens = 40, rates = llm.Curation.MixRates,
        defaultRate = 100, budget = 512), 33000L, 950000L),
    // one un-checkpointed LPA round (measured 30000 / 0.29 MB at
    // sf0.01, exactly 10x at sf0.1 — ids and labels only, ~10 B/row);
    // the declared query's per-round localCheckpoints hide this, and
    // it is the per-iteration wire cost the loop multiplies
    ("core:graph_label_prop_round",
      () => {
        val (nodes, edges) = llm.Dedup.lpaFixture(
          Tables.documents(spark, sfDir).select(col("doc_id")))
        llm.Dedup.labelPropagationRoundPlan(nodes, edges)
      }, 37500L, 600000L))

  coreVolumeGates.foreach { case (name, mk, maxRecs, maxBytes) =>
    test(s"$name: pre-checkpoint shuffle volume <= $maxRecs rows / $maxBytes bytes") {
      val (sb, srec, _) = withShuffleJoins(PlanAudit.shuffleStats(mk()))
      assert(srec <= maxRecs,
        s"$name shuffled $srec records > $maxRecs — a stage stopped pre-aggregating?")
      assert(sb <= maxBytes,
        s"$name shuffled $sb bytes > $maxBytes — a payload column entered an exchange?")
    }
  }

  test("core:incremental_refresh_served: shuffle volume is delta-bounded") {
    // The served gate's wire claim, measured (r16): with every corpus
    // artifact persisted, the composed cascade shuffles ONLY
    // delta-derived rows — band/gram keys of the arriving batch plus
    // the verify pairs — never the corpus (the bucketed scans read
    // co-located; the composition pin in LlmSpec proves the shape,
    // this gates the VOLUME riding it). Runs on the NON-DEGENERATE
    // planted fixture: the verify-pair volume is candidate-bounded,
    // and on the vocabulary-dense raw corpus candidates ≈ delta ×
    // corpus (measured: 263k recs / 3.6 MB at sf0.01 blowing up 79× /
    // 45× at sf0.1 — the all-similar pathology, a data property the
    // candidate-density kill switch exists for), while on a realistic
    // disjoint-vocabulary corpus candidates ≈ planted dups and the
    // wire stays a small multiple of the delta.
    import graft.llm.Curation
    val fx = Bench.lshFixtureCached(spark, sfDir)
    val corpus = Tables.documents(spark, fx).select(col("doc_id"), col("text"))
    val emb = Tables.embeddings(spark, fx)
    val uid = java.util.UUID.randomUUID().toString.replace("-", "")
    val hashTbl = s"rfr_vol_hash_$uid"
    val bandTbl = s"rfr_vol_band_$uid"
    val path = tempDir("rfr_vol")
    llm.Dedup.buildHashIndex(corpus, spark, hashTbl, s"$path/$hashTbl")
    llm.Dedup.buildBandIndex(corpus, spark, bandTbl, s"$path/$bandTbl")
    llm.Similarity.buildIvfIndexPinned(emb, s"$path/ivf")
    try {
      val evG = Curation.evalGrams(corpus, col("doc_id") % 7 === 0).localCheckpoint()
      val deltaDocs = Curation.refreshDeltaDocs(corpus).localCheckpoint()
      val deltaEmb = Curation.refreshDeltaEmb(emb).localCheckpoint()
      val (sb, srec, _) = withShuffleJoins(PlanAudit.shuffleStats(
        Curation.incrementalRefreshServed(
          deltaDocs, deltaEmb, spark, hashTbl, bandTbl, s"$path/ivf", evG)))
      val nDelta = deltaDocs.count()
      info(f"served refresh shuffled $srec records / $sb bytes over " +
        f"$nDelta delta docs (${srec.toDouble / nDelta}%.1f recs/doc, " +
        f"${sb.toDouble / nDelta}%.0f B/doc)")
      // measured ≈158 recs / ≈4.8 KB per DELTA DOC at sf0.01 (gram
      // keys + band keys + verify pairs), ≈128 recs / 2.3 KB at sf0.1 —
      // the delta-bounded property is per-doc wire cost staying flat
      // while the delta grows, so the gate is a RATIO to the delta row
      // count (ADVICE r16: absolute ceilings flake on fixture size /
      // partition count / AQE changes without any plan regression).
      // Headroom ~1.6× over measured; the raw-corpus pathology reads
      // ~800 recs/doc at sf0.01 and ~3,000 at sf0.1 — far past it.
      assert(srec <= nDelta * 250L,
        f"served refresh shuffled ${srec.toDouble / nDelta}%.1f recs per delta doc")
      assert(sb <= nDelta * 8192L,
        f"served refresh shuffled ${sb.toDouble / nDelta}%.0f bytes per delta doc")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $hashTbl")
      spark.sql(s"DROP TABLE IF EXISTS ${bandTbl}_bands")
      spark.sql(s"DROP TABLE IF EXISTS ${bandTbl}_toks")
    }
  }

  // r14: the forced-consumer measurement assumption itself, pinned.
  // Bench's queries_forced block exists because a bare count() lets
  // ColumnPruning drop the Window operators (nothing downstream reads
  // their outputs) — the headline then times the scan, not the window
  // (VERDICT r13 "What's wrong" #2; SkewProbe measured a flat ~0.19 s
  // from 100k to 10M rows before the probes switched consumers). If a
  // Spark upgrade ever changes either side — count() keeping windows
  // (forced pass becomes redundant) or forceAll losing them (forced
  // pass measures nothing) — this fails loud instead of the bench
  // silently publishing a wrong-shaped number.
  // r14 audit, promoted to a gate: the forced set is exactly the
  // headline queries whose executed plan LOSES operators under a
  // count() consumer — windows pruned (nothing reads their outputs)
  // or, for aggregates consumed for row count alone, value columns
  // pruned taking their window inputs with them (how telemetry_daily/
  // confusion hid their windows despite aggregating window outputs).
  // A count()-only divergent query publishes a hollow headline number;
  // this derives the divergent set per run and fails if any member is
  // missing from Bench.forcedQueries. (Join-shaped divergence — e.g.
  // Catalyst eliminating a left join against a unique-keyed aggregate,
  // the serving-probe measurement bug — is counted too.)
  test("every headline query that loses plan operators under count() is forced") {
    import org.apache.spark.sql.functions.{sum, xxhash64}
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      val names = collectPlan(qe.executedPlan).map(_.getClass.getSimpleName)
      (names.count(_.contains("Join")), names.count(_.startsWith("Window")))
    }
    val tiny = sf("sf0.001")
    val fixtureTiny = Bench.lshFixtureCached(spark, tiny)
    val divergent = SparkEntry.all
      .filter(q => SparkEntry.headline.contains(q.name))
      .flatMap { q =>
        val dir = if (Bench.fixtureQueries.contains(q.name)) fixtureTiny else tiny
        val base = q.run(spark, dir)
        val counted = shape(base.groupBy().count())
        val forced = shape(base.select(
          sum(xxhash64(base.columns.toIndexedSeq.map(col): _*).cast("double"))))
        if (counted != forced) Some(q.name) else None
      }
    val missing = divergent.filterNot(Bench.forcedQueries.contains)
    assert(missing.isEmpty,
      s"headline queries lose operators under count() but are not in " +
        s"Bench.forcedQueries: ${missing.mkString(", ")}")
  }

  test("forceAll keeps the Window operators that count() prunes") {
    import org.apache.spark.sql.execution.window.WindowExec
    val feats = pipeline.Telemetry.features(Tables.events(spark, sfDir))
    val counted = feats.groupBy().count()
    counted.collect()
    val prunedWindows = collectPlan(counted.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(prunedWindows.isEmpty,
      "count() now keeps Window operators — the forced consumer is redundant")
    val forced = feats.select(
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.xxhash64(feats.columns.toIndexedSeq.map(col): _*)
          .cast("double")))
    forced.collect()
    val keptWindows = collectPlan(forced.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(keptWindows.nonEmpty,
      "forceAll's consumer no longer keeps the Window operators — it measures nothing")
  }

  test("skewAdvice applies the AQE detector's conditions to the planted-hot fixture") {
    // VERDICT r14 task 7: the blind-spot decision rule as a callable.
    // SaltProbe's planted-hot shape in miniature: 4-in-5 fact rows on
    // ONE join key. The fraction is deliberately high because the
    // fixture must clear the detector's 5× factor IN COMPRESSED BYTES
    // — the hot partition's repeated key compresses far better than
    // the uniform ones (the 4.59× blind gap this rule exists for), so
    // a 50% hot fraction reads only ~3.4× compressed. Still far below
    // 256 MB — exactly the regime where AQE's detector stays silent
    // and the advice must be "salt".
    import org.apache.spark.sql.functions._
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try {
      def planted(hot: Boolean) = {
        val fact = spark.range(0, 200000L, 1, 8).select(
          (if (hot) when(pmod(col("id"), lit(5L)) < 4, lit(0L))
            .otherwise(pmod(hash(col("id")), lit(9999L)) + 1)
          else pmod(hash(col("id")), lit(10000L))).as("k"),
          col("id").as("v"))
        val dim = spark.range(0, 10000L, 1, 4)
          .select(col("id").as("dk"), (col("id") % 100).as("payload"))
        fact.join(dim, col("k") === col("dk"))
          .select(sum(col("v") + col("payload")).as("s"))
      }
      val hotAdv = PlanAudit.skewAdvice(planted(hot = true))
      assert(hotAdv.nonEmpty, "planted-hot join must yield a readable shuffle stage")
      val a = hotAdv.get
      assert(a.skewFactor > a.detectorFactor,
        s"planted hot key must exceed the detector factor: $a")
      assert(a.hotBytes < a.thresholdBytes,
        s"fixture must sit under the 256 MB threshold (the blind regime): $a")
      assert(!a.aqeWouldSplit && a.advice === "salt", s"expected salt advice: $a")
      assert(a.hotIsJoinInput, s"the planted-hot stage feeds an SMJ/SHJ input: $a")
      assert(a.estTrueHotBytes === a.hotBytes * PlanAudit.MeasuredBlindFactor)
      // uniform keys → no skewed partition → "none"
      val uniAdv = PlanAudit.skewAdvice(planted(hot = false))
      assert(uniAdv.nonEmpty && uniAdv.get.advice === "none",
        s"uniform join must advise none: $uniAdv")
      // detector regime: drop the threshold below the hot partition's
      // compressed bytes and the SAME shape reads "aqe-handles"
      val prevThresh =
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      try {
        val fires = PlanAudit.skewAdvice(planted(hot = true))
        assert(fires.nonEmpty && fires.get.aqeWouldSplit &&
          fires.get.advice === "aqe-handles",
          s"with the threshold under the hot bytes the detector fires: $fires")
        // ADVICE r15: OptimizeSkewedJoin only rewrites SMJ/SHJ inputs —
        // the SAME hot key feeding a non-join shuffle must read "salt"
        // even when it clears both size thresholds, because the
        // runtime split never fires on a non-join consumer. The old
        // verdict said "aqe-handles" here — the opposite of the needed
        // guidance. The fixture is a WINDOW shuffle, the genuinely
        // skew-vulnerable non-join case (a groupBy-sum would NOT do:
        // map-side partial aggregation collapses the hot key to one
        // row per task before the wire — that absorption is exactly
        // why plain hash aggregates rarely skew, and why the first
        // draft of this test measured skewFactor 1.02 on an 80%-hot
        // key); ChunkedWindow.features is the mitigation this verdict
        // routes to.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("v"))
        val winHot = spark.range(0, 200000L, 1, 8).select(
            when(pmod(col("id"), lit(5L)) < 4, lit(0L))
              .otherwise(pmod(hash(col("id")), lit(9999L)) + 1).as("k"),
            col("id").as("v"))
          .withColumn("rn", row_number().over(w))
          .groupBy().agg(sum(col("rn")).as("s"))
        val winAdv = PlanAudit.skewAdvice(winHot)
        assert(winAdv.nonEmpty, "window fixture must yield a readable shuffle stage")
        val ag = winAdv.get
        assert(ag.skewFactor > ag.detectorFactor && ag.hotBytes > ag.thresholdBytes,
          s"window fixture must be skewed above the (lowered) threshold: $ag")
        assert(!ag.hotIsJoinInput && !ag.aqeWouldSplit && ag.advice === "salt",
          s"a skewed non-join shuffle must advise salt (AQE never splits it): $ag")
      } finally spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prevThresh)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
    }
  }

  test("global-window census: every unpartitioned Window in a declared query is plan-bounded or allowlisted (r21)") {
    // VERDICT r20 task 3: Verify's tail carries repeated `WindowExec:
    // No Partition Defined` WARNs — every such site moves ALL its input
    // to ONE task. Harmless on an n-bounded frame (rank windows over a
    // top-k list), a 100 TB scale-killer on a data-sized one. This gate
    // walks every declared query's pre-execution plan
    // (PlanAudit.unpartitionedWindows): a site passes when its input is
    // PROVABLY bounded by plan construction (limit / 1-row aggregate /
    // literal frame below every data-sized path — PlanAudit
    // .boundedOutput), or when the query is ALLOWLISTED with a reason.
    // Every allowlist entry must be one of two documented classes:
    //  - bounded-GRID frames: the window runs over a grouped rollup
    //    whose key domain is bounded (calendar buckets, digit grids,
    //    histogram buckets, contingency cells) — group count is not
    //    provable from the plan, so the prover fails closed;
    //  - exact ORDER STATISTICS: the declared semantics require a
    //    total order (KS, exact AUC, conformal quantile, equi-depth
    //    boundaries, top-fraction thresholds) — each has a bucketed /
    //    sketch / two-phase sibling as the at-scale form.
    // A NEW query with an unlisted data-sized global window fails here.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val gateDir = sf("sf0.001")

    // control 1: a PLANTED data-sized global window must be flagged —
    // if it ever stops failing, the census is measuring nothing
    val planted = Tables.lineitem(spark, gateDir)
      .withColumn("rn", row_number().over(Window.orderBy(col("l_orderkey"))))
    val plantedSites = PlanAudit.unpartitionedWindows(planted)
    assert(plantedSites.nonEmpty && plantedSites.exists(!_.boundedInput),
      s"the planted unbounded global window must be caught: $plantedSites")
    // control 2: the same window over a plan-limited input proves bounded
    val proved = Tables.lineitem(spark, gateDir)
      .orderBy(col("l_orderkey")).limit(10)
      .withColumn("rn", row_number().over(Window.orderBy(col("l_orderkey"))))
    val provedSites = PlanAudit.unpartitionedWindows(proved)
    assert(provedSites.nonEmpty && provedSites.forall(_.boundedInput),
      s"a limit-bounded global window must classify bounded: $provedSites")

    val allow: Map[String, String] = Map(
      "analytics_market_share" ->
        "share-of-total over the per-year rollup (calendar-bounded grid)",
      "analytics_pareto_frontier" ->
        "running min over the per-size rollup (p_size domain grid)",
      "audit_benford" -> "digit-grid totals (9 rows)",
      "audit_ks_drift" ->
        "exact KS needs the value total order; audit_ks_drift_bucketed is the at-scale sibling",
      "audit_ks_drift_bucketed" -> "cum-sums over the bounded bucket grid",
      "audit_psi_drift" -> "bucket-grid totals (32 rows)",
      "events_concurrency_peak" ->
        "cumulative concurrency over the time-bucket grid (calendar-bounded)",
      "events_rfm_segments" ->
        "user-sized total rank: the declared RFM quintile semantics; two-phase rank is the at-scale rewrite (r21 backlog)",
      "events_slo_burn" -> "rolling error budget over the hour grid (calendar-bounded)",
      "ml_auc_exact" -> "exact AUC is a total-order statistic over distinct scores",
      "ml_chi2_independence" -> "global totals over the bounded contingency grid",
      "ml_conformal_interval" ->
        "conformal quantile is an order statistic over calibration scores",
      "ml_e2e_metrics_pinned" -> "exact AUC total-order statistic (the ml_auc_exact class)",
      "ml_lift_table" -> "cumulative lift needs the score total order (decile output)",
      "sketch_log_histogram_quantiles" ->
        "cum-counts over the bounded log-bucket grid",
      "stats_histogram_eqdepth" ->
        "equi-depth boundaries are order statistics over distinct values",
      "telemetry_calibration_error" ->
        "global totals over the bounded score-bucket grid",
      "threshold_select" ->
        "top-fraction threshold is a total-order statistic over scores")

    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val seenUnbounded = scala.collection.mutable.Set.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val sites = PlanAudit.unpartitionedWindows(fn(spark, gateDir))
      for (s <- sites if !s.boundedInput) {
        seenUnbounded += name
        if (!allow.contains(name)) offenders += s"$name: $s"
      }
    }
    assert(offenders.isEmpty,
      "declared queries with un-allowlisted data-sized global windows " +
        s"(bound the frame, two-phase the rank, or allowlist with a reason):\n" +
        offenders.mkString("\n"))
    // the allowlist itself must stay honest: an entry whose query no
    // longer surfaces an unbounded global window is stale
    val stale = allow.keySet -- seenUnbounded
    assert(stale.isEmpty, s"stale global-window allowlist entries: $stale")
  }

  test("driver-budget gate: no declared query materializes unbounded rows on the driver (r20)") {
    // VERDICT r19 task 4: the r19 audit grep ("all 26 .collect() sites
    // in main are bounded artifacts") as a PERMANENT failing gate — a
    // new declared query whose CONSTRUCTION collects unbounded rows to
    // the driver fails here instead of shipping a driver OOM at 100 TB.
    // Budget: 4096 rows — above every legitimate bounded artifact
    // (class-count maps, thresholds, mmrRerank's hard 256-candidate
    // cap, probe rows, BPE merge tables) and below the smallest table's
    // full row count at this scale (~6k lineitem rows at sf0.001), so
    // "collected a whole table" can never pass as "bounded artifact".
    import org.apache.spark.sql.functions.col
    val gateDir = sf("sf0.001")
    val Budget = 4096L

    // control: a PLANTED unbounded collect must fail the gate — if it
    // ever stops failing, the gate is measuring nothing
    val (_, planted) = PlanAudit.auditDriverFetches(spark) {
      Tables.lineitem(spark, gateDir).select(col("l_orderkey")).collect()
    }
    assert(planted.exists(f => f.funcName == "collect" && !f.bounded(Budget)),
      s"the planted unbounded collect must be caught: $planted")
    // ...and a plan-limited fetch passes without a measured re-count
    val (_, limited) = PlanAudit.auditDriverFetches(spark) {
      Tables.lineitem(spark, gateDir).orderBy(col("l_orderkey")).limit(10).collect()
    }
    assert(limited.exists(f => f.planLimit.contains(10L) && f.bounded(Budget)),
      s"a CollectLimit fetch must classify as plan-bounded: $limited")

    // measurement soundness (review r20): a metric-less MULTI-child
    // root must charge the SUM of its children — the first-child-only
    // descent let a collected union hide every row after child one
    // (two 3k-row sides read as 3k, passing a 4k budget on a 6k
    // fetch). UnionExec carries no numOutputRows, so this exercises
    // the multi-child path for real.
    val li = Tables.lineitem(spark, gateDir).select(col("l_orderkey"))
    val nAll = li.count()
    val (_, unioned) = PlanAudit.auditDriverFetches(spark) {
      li.filter(col("l_orderkey") % 2 === 0)
        .union(li.filter(col("l_orderkey") % 2 =!= 0)).collect()
    }
    val uf = unioned.filter(_.funcName == "collect")
    assert(uf.exists(f => f.planLimit.isEmpty && f.rows.contains(nAll)),
      s"a collected union must measure the sum of its children ($nAll rows): $uf")
    // ...and tail is plan-bounded by its limit, not charged the
    // child's full count (the inverse false positive)
    val (_, tailed) = PlanAudit.auditDriverFetches(spark) { li.tail(5); () }
    assert(tailed.exists(f =>
      f.funcName == "tail" && f.planLimit.contains(5L) && f.bounded(Budget)),
      s"tail(5) must classify as plan-bounded: $tailed")

    // the gate: EVERY declared query's construction stays under budget
    // (construction is where the driver loops live — checkpoint
    // materializations, threshold selections, rerank loops; the
    // returned frame itself is executed distributed by Verify)
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val (_, fetches) = PlanAudit.auditDriverFetches(spark) { fn(spark, gateDir); () }
      for (f <- fetches if !f.bounded(Budget))
        offenders += s"$name: $f"
    }
    assert(offenders.isEmpty,
      s"declared queries with unbounded driver fetches (budget $Budget rows):\n" +
        offenders.mkString("\n"))
  }
}
