package graft

import org.apache.spark.sql.functions._

import graft.queries.Sketches

/** Round-10 mergeable sketches: KMV small-set exactness, lossless
  * merge, estimator accuracy, and the WindowGroupLimit (map-side
  * partial top-k) plan shape; CMS one-sided error, bounded summary
  * size, and heavy-hitter recovery. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: below-k groups are exact (the sketch IS the set)") {
    val df = ((1 to 10).map(i => ("a", i)) ++ (1 to 3).map(i => ("b", i * 100)))
      .toDF("g", "k")
    val got = Sketches.kmvDistinct(df, "g", "k").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got("a") === ((10.0, 10L)))
    assert(got("b") === ((3.0, 3L)))
    // 13 distinct keys overall (hash collisions impossible to matter
    // below k) — the merged row is exact too
    assert(got("*ALL*") === ((13.0, 13L)))
  }

  test("kmv: merge of per-group sketches equals the sketch of the union") {
    // Same keys presented (a) split across 3 groups and (b) as one
    // group: the *ALL* estimate must be IDENTICAL — bottom-k of
    // bottom-k sketches is bottom-k of the union, the lossless-merge
    // property that makes KMV the distributed cardinality primitive.
    val keys = (1 to 2000).map(i => i * 7919)
    val split = keys.map(i => (s"g${i % 3}", i)).toDF("g", "k")
    val one = keys.map(i => ("all", i)).toDF("g", "k")
    val viaMerge = Sketches.kmvDistinct(split, "g", "k")
      .filter(col("grp") === "*ALL*").select("kmv_est").as[Double].head()
    val direct = Sketches.kmvDistinct(one, "g", "k")
      .filter(col("grp") === "all").select("kmv_est").as[Double].head()
    assert(viaMerge === direct)
  }

  test("kmv: estimate lands within the sketch's error regime") {
    // 1/sqrt(k-1) ~ 13% expected rel-err at k=64; allow 4 sigma.
    val got = Sketches.kmvDistinct(Tables.lineitem(spark, sf("sf0.001")),
      "l_returnflag", "l_orderkey").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      assert(exact > Sketches.KmvK, s"fixture too small for ${r.getString(0)}")
      assert(math.abs(est - exact) / exact < 0.52,
        s"grp=${r.getString(0)} est=$est exact=$exact")
    }
  }

  test("kmv: plans a WindowGroupLimit — per-map bottom-k before the exchange") {
    // orders, not lineitem: kmvDistinct in the sibling test PERSISTS
    // the lineitem sketch, and the cache manager would swap this
    // identical plan for the InMemoryRelation, hiding the shape.
    val df = Sketches.kmvSketch(Tables.orders(spark, sf("sf0.001")),
      "o_orderstatus", "o_custkey")
    df.collect()
    val plan = collectPlan(df.queryExecution.executedPlan)
    assert(plan.exists(_.getClass.getSimpleName.contains("WindowGroupLimit")),
      "kmv sketch should select bottom-k via WindowGroupLimit, not a full sort")
  }

  test("kmv setops: below-k pairs are exact; planted overlap recovered") {
    // Sets below k=64, so sketches ARE the hash sets and both
    // estimates must be EXACT: A = 1..40, B = 21..60 (∩ = 20),
    // C = 1000..1019 disjoint from both.
    val df = ((1 to 40).map(i => ("A", i.toLong)) ++
      (21 to 60).map(i => ("B", i.toLong)) ++
      (1000 to 1019).map(i => ("C", i.toLong))).toDF("g", "k")
    val got = Sketches.kmvSetOps(df, "g", "k").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("est_union"), r.getAs[Double]("est_intersect"),
          r.getAs[Double]("est_anb"), r.getAs[Long]("n_union"),
          r.getAs[Long]("n_intersect"), r.getAs[Long]("n_anb")))).toMap
    // below k everything is exact, A-not-B included (r12)
    assert(got(("A", "B")) === ((60.0, 20.0, 20.0, 60L, 20L, 20L)))
    assert(got(("A", "C")) === ((60.0, 0.0, 40.0, 60L, 0L, 40L)))
    assert(got(("B", "C")) === ((60.0, 0.0, 40.0, 60L, 0L, 40L)))
  }

  test("kmv setops: estimate regime lands within the union-scaled error band") {
    val got = Sketches.kmvSetOps(Tables.lineitem(spark, sf("sf0.001")),
      "l_returnflag", "l_orderkey").collect()
    assert(got.length === 3) // 3 flags -> 3 pairs
    got.foreach { r =>
      val (estU, estI, estA) = (r.getAs[Double]("est_union"),
        r.getAs[Double]("est_intersect"), r.getAs[Double]("est_anb"))
      val (nU, nI, nA) = (r.getAs[Long]("n_union"),
        r.getAs[Long]("n_intersect"), r.getAs[Long]("n_anb"))
      assert(nI > 0, "fixture intersections must be non-trivial")
      // union: the KMV regime (4 sigma of 1/sqrt(k-1))
      assert(math.abs(estU - nU) / nU < 0.52, s"union est=$estU exact=$nU")
      // intersection error scales with the UNION size (theta trade)
      assert(math.abs(estI - nI) <= 0.52 * nU, s"inter est=$estI exact=$nI union=$nU")
      // A-not-B shares the same union-scaled band (r12), and the three
      // estimates telescope exactly: anb = (A-side retained) - common,
      // so est_intersect + est_anb estimates |A| within the band too
      assert(math.abs(estA - nA) <= 0.52 * nU, s"anb est=$estA exact=$nA union=$nU")
    }
  }

  test("cms: hand fixture — estimates never undercount, heavy hitter on top") {
    val docs = Seq(
      (1L, "a a a a a b c"),
      (2L, "a a b d e"),
      (3L, "a c d")).toDF("doc_id", "text")
    val got = Sketches.cmsTopTokens(docs, topK = 100).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exact = Map("a" -> 8L, "b" -> 2L, "c" -> 2L, "d" -> 2L, "e" -> 1L)
    assert(got.map(_._1).toSet === exact.keySet)
    got.foreach { case (tok, nExact, est) =>
      assert(nExact === exact(tok))
      assert(est >= nExact, s"CMS undercounted $tok: $est < $nExact")
    }
    // est-desc, token-asc total order puts the (collision-inflated or
    // exact) heaviest token first; with 4x512 cells vs 5 tokens the
    // top estimate is a's
    assert(got.head._1 === "a")
  }

  test("cms: corpus probe — one-sided error everywhere, summary stays d*w-bounded") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val all = Sketches.cmsTopTokens(docs, topK = 1000000).collect()
    assert(all.nonEmpty)
    all.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS undercounted ${r.getString(0)}")
    }
    // declared top-15 contains the exact top-5 (collision noise is
    // bounded by eps*N/w spread over 4 independent rows)
    val top15ByEst = all.sortBy(r => (-r.getLong(2), r.getString(0))).take(15)
      .map(_.getString(0)).toSet
    val top5ByExact = all.sortBy(r => (-r.getLong(1), r.getString(0))).take(5)
      .map(_.getString(0)).toSet
    assert(top5ByExact.subsetOf(top15ByEst))
    // the counter table itself is the bounded summary
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val counters = Sketches.cmsCountersStream(toks)
    assert(counters.count() <= Sketches.CmsD * Sketches.CmsW)
  }

  test("cms: frequency-table build equals the stream build cell for cell") {
    // The declared query builds counters from per-token counts (the
    // exact table is in the output anyway); the online form builds
    // from the raw stream. A cell's value is the sum of its tokens'
    // occurrence counts either way — pin the identity.
    val docs = Tables.documents(spark, sf("sf0.001"))
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    val stream = Sketches.cmsCountersStream(toks)
    val fromCounts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .select(col("tok"), col("n_exact"), md5(col("tok")).as("m"),
        explode(array((0 until Sketches.CmsD).map(lit): _*)).as("r"))
      .withColumn("b",
        pmod(conv(expr("substring(m, 1 + 8*r, 8)"), 16, 10).cast("long"),
          lit(Sketches.CmsW)))
      .groupBy(col("r"), col("b")).agg(sum(col("n_exact")).as("c"))
    val diff = stream.withColumnRenamed("c", "c1")
      .join(fromCounts.withColumnRenamed("c", "c2"), Seq("r", "b"), "full_outer")
      .filter(!(col("c1") <=> col("c2")))
    assert(diff.count() === 0L)
  }

  test("cms join size: estimate bounds the true join size from above, reconciles with the real join") {
    val r = SparkEntry.queries("sketch_cms_join_size")(spark, sf("sf0.001")).collect()
    assert(r.length === 1)
    val (nV, nP, est, exact) =
      (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // CMS inner product only ADDS collision cross-terms — one-sided
    assert(est >= exact, s"estimator undercut the join: est=$est exact=$exact")
    assert(exact > 0L && est <= nV * nP, "degenerate fixture")
    // the 'exact' column really is the join size: run the join
    val ev = Tables.events(spark, sf("sf0.001"))
    val joined = ev.filter(col("event_type") === "view").select(col("user_id"))
      .join(ev.filter(col("event_type") === "purchase").select(col("user_id")), "user_id")
      .count()
    assert(exact === joined)
    // Cormode–Muthukrishnan inner-product bound (ADVICE r9): the
    // collision excess of ONE row exceeds ε·‖A‖₁·‖B‖₁ (ε = e/w) with
    // probability ≤ 1/e; the min over d = 4 independent rows exceeds
    // it with probability ≤ e⁻⁴ ≈ 1.8% — assert the bound itself on
    // the declared fixture (n1·n2 = ‖A‖₁·‖B‖₁ here)
    val eps = math.E / graft.queries.Sketches.CmsW
    assert(est - exact <= eps * nV * nP,
      s"CMS excess ${est - exact} breaks the e/w bound ${eps * nV * nP}")
  }

  test("log-histogram quantiles: containment is structural and width is <= 10% relative") {
    // Run the declared query on sf0.001: whatever the data, the exact
    // disc-quantile MUST land in the selected bucket (the rank-target
    // element is inside the first bucket whose cumulative count covers
    // it), and every multi-digit bucket's width is one tenth of its
    // decade.
    val rows = SparkEntry.queries("sketch_log_histogram_quantiles")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 4)
    for (r <- rows) {
      assert(r.getAs[Long]("contained") === 1L)
      val lo = r.getAs[Long]("est_lo_us")
      val w = r.getAs[Long]("width_us")
      if (lo >= 10) assert(w * 10 <= lo + w, s"width $w too wide for bucket at $lo")
      val eq = r.getAs[Long]("exact_q_us")
      assert(eq >= lo && eq < lo + w)
    }
  }

  test("log-histogram: the bucket map is a pure function of the value (merge = addition)") {
    // Mergeability evidence without private plumbing: bucketing two
    // halves separately and summing the histograms equals bucketing
    // the whole — because the (lo, w) key depends only on the value.
    // Exercised through the same integer digit-count expressions the
    // query uses.
    import spark.implicits._
    val vals = Seq(1L, 9L, 10L, 99L, 100L, 101L, 950L, 951L, 26879390000L)
    def bucket(vi: Long): (Long, Long) = {
      val d = vi.toString.length - 1
      val w = if (d == 0) 1L else math.pow(10, d - 1).toLong
      ((vi / w) * w, w)
    }
    val (a, b) = vals.splitAt(4)
    val whole = vals.groupBy(bucket).view.mapValues(_.size).toMap
    val merged = (a.groupBy(bucket).view.mapValues(_.size).toMap.toSeq ++
      b.groupBy(bucket).view.mapValues(_.size).toMap.toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(whole === merged)
    // and the Spark-side expression agrees with the model
    val df = vals.toDF("vi")
      .withColumn("w",
        when(length(col("vi").cast("string")) === 1, lit(1L))
          .otherwise(expr(
            "cast(concat('1', repeat('0', length(cast(vi as string)) - 2)) as bigint)")))
      .select(col("vi"), expr("(vi div w) * w").as("lo"), col("w"))
    val got = df.as[(Long, Long, Long)].collect()
      .map { case (vi, lo, w) => vi -> ((lo, w)) }.toMap
    assert(vals.forall(v => got(v) === bucket(v)))
  }

  test("agg_approx_distinct: Spark HLL++ inside its own and the native sketch's 2σ envelopes") {
    // VERDICT r13 task 7: the one remaining "trust Spark" rows-only
    // declaration gets an independent check — Spark's engine-internal
    // HLL++ estimate must land (a) within its OWN declared ±2σ (the
    // query passes rsd 0.02 → 4%), and (b) within a combined ±2σ of
    // graft's native register HLL built on the SAME key column (σ =
    // 1.04/√m, m = 256 → 6.5%), whose estimate is itself oracle-
    // hash-pinned by sketch_hll_distinct. Two independent sketch
    // implementations agreeing on the same data is the adjudication a
    // seed note alone cannot give.
    val r = SparkEntry.queries("agg_approx_distinct")(spark, sf("sf0.01")).head()
    val approx = r.getAs[Long]("approx_orders").toDouble
    val exact = r.getAs[Long]("exact_orders").toDouble
    assert(math.abs(approx - exact) / exact <= 0.04,
      f"Spark HLL++ $approx vs exact $exact — outside its declared 2σ (4%%)")
    val li = Tables.lineitem(spark, sf("sf0.01")).withColumn("g", lit("g"))
    val native = Sketches.hllDistinct(li, "g", "l_orderkey")
      .filter(col("grp") === "g").head().getAs[Double]("hll_est")
    val sigmaN = 1.04 / math.sqrt(Sketches.HllM.toDouble)
    assert(math.abs(native - exact) / exact <= 2 * sigmaN,
      f"native HLL $native vs exact $exact — outside 2σ = ${2 * sigmaN}%.3f")
    assert(math.abs(approx - native) / exact <=
      2 * math.sqrt(0.02 * 0.02 + sigmaN * sigmaN),
      f"the two sketches disagree: spark $approx vs native $native (exact $exact)")
  }

  test("hll: merge of per-group registers equals the one-group sketch; estimate in regime") {
    val orders = Tables.orders(spark, sf("sf0.01"))
    val grouped = Sketches.hllDistinct(orders, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("hll_est"), r.getAs[Long]("n_exact")))).toMap
    // lossless register-wise merge: the *ALL* row (slot-wise max over
    // per-group register tables) must EQUAL the sketch built with no
    // grouping at all — same registers, same estimate, bit for bit
    val single = Sketches.hllDistinct(
      orders.withColumn("one", lit("x")), "one", "o_custkey")
      .filter(col("grp") === "x").head()
    assert(grouped("*ALL*")._1 === single.getAs[Double]("hll_est"),
      "merged *ALL* estimate != ungrouped sketch estimate")
    // estimator regime at n ≈ 1300 >> 2.5·m: raw HLL's published
    // relative error is 1.04/√m ≈ 6.5%; allow 3σ
    grouped.foreach { case (g, (est, exact)) =>
      val rel = math.abs(est - exact) / exact
      assert(rel < 0.20, f"$g: hll est $est vs exact $exact (rel $rel%.3f)")
    }
    // registers are data-size-independent: the sketch frame the merge
    // consumed is ≤ m rows per group
    val regs = Sketches.hllDistinct(orders, "o_orderpriority", "o_custkey")
    assert(regs.count() === 6L) // 5 priorities + *ALL*
  }

  test("hll: native hll_rho == bin-length form == the arithmetic definition") {
    // three ways to the same rank on real hashes: the native LZCNT
    // expression (the register-scan path), the length(bin(w)) form
    // (the DuckDB oracle's arithmetic), and a direct Scala
    // computation — all must agree row for row
    val hashes = Tables.orders(spark, sf("sf0.001"))
      .select(Sketches.h48("hll:", col("o_custkey").cast("string")).as("h"))
      .limit(200)
      .selectExpr("h", s"h div ${Sketches.HllM} AS w")
      .withColumn("rho_bin",
        when(col("w") === 0L, lit(Sketches.HllRhoMax))
          .otherwise(lit(Sketches.HllRhoMax) - length(bin(col("w")))))
      .withColumn("rho_native", graft.functions.hll_rho(col("w"), Sketches.HllRhoMax))
      .as[(Long, Long, Int, Int)].collect()
    assert(hashes.nonEmpty)
    hashes.foreach { case (h, w, rhoBin, rhoNative) =>
      val expected =
        if (w == 0L) Sketches.HllRhoMax
        else Sketches.HllRhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
      assert(rhoBin === expected, s"bin form: h=$h w=$w")
      assert(rhoNative === expected, s"native form: h=$h w=$w")
    }
    // boundary values through the interpreted path too
    import org.apache.spark.sql.catalyst.expressions.Literal
    def evalOn(w: Long) =
      graft.functions.HllRho(Literal(w), Sketches.HllRhoMax).eval(null)
    assert(evalOn(0L) === Sketches.HllRhoMax)
    assert(evalOn(1L) === Sketches.HllRhoMax - 1)
    assert(evalOn((1L << 40) - 1) === Sketches.HllRhoMax - 40)
  }
}
