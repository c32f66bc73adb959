package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, Salted, Sessionize}

/** Round-3 operator surface: sessionization, salted join, bucketized
  * range join, partition-pruned scan. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("sessionize: gap rule splits sessions exactly at > gap, ids are per-user") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:29:00")), // 29 min gap -> same session
      (3L, 10L, ts("2024-01-01 01:00:00")), // 31 min gap -> new session
      (4L, 10L, ts("2024-01-01 01:30:00")), // exactly 30 min -> SAME session (strict >)
      (5L, 20L, ts("2024-01-01 00:00:00"))) // other user starts at 1 again
      .toDF("event_id", "user_id", "ts")
    val got = Sessionize.withSessionIds(e, gapSeconds = 1800L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("salted join: result equals plain join, salt columns never leak") {
    val fact = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    val dim = Tables.orders(spark, sf("sf0.001"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val salted = Salted.joinSalted(fact, dim, "l_orderkey", "o_orderkey",
      saltSource = Seq("l_orderkey", "l_linenumber"), salts = 8)
    assert(!salted.columns.exists(_.contains("salt")))
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
    assert(salted.count() === plain.count())
    val sAgg = salted.groupBy("o_orderpriority").agg(
      sum(col("l_quantity").cast("decimal(30,6)")).as("q")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val pAgg = plain.groupBy("o_orderpriority").agg(
      sum(col("l_quantity").cast("decimal(30,6)")).as("q")).collect()
      .map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(sAgg === pAgg)
  }

  test("range join: boundary semantics are half-open and bucket-spanning intervals dedup-free") {
    val points = Seq(
      (1L, ts("2024-01-01 03:00:00")), // == start -> in
      (2L, ts("2024-01-01 17:30:00")), // == end   -> out (half-open)
      (3L, ts("2024-01-01 11:59:59")), // inside, before bucket boundary
      (4L, ts("2024-01-01 12:00:00")), // inside, first instant of 2nd bucket
      (5L, ts("2024-01-01 02:59:59"))) // before start -> out
      .toDF("pid", "ts")
    val iv = Seq((ts("2024-01-01 03:00:00"), ts("2024-01-01 17:30:00")))
      .toDF("start_ts", "end_ts")
    val got = RangeJoin.pointInInterval(points, iv, "ts", "start_ts", "end_ts",
      bucketMicros = 12L * 3600 * 1000000)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 3L, 4L)) // each matched exactly once
  }

  test("intervalOverlap: fixture pins touch/disjoint/multi-bucket; sf0.001 equals naive join") {
    def us(s: String): Long = ts(s).getTime * 1000L
    val day = java.sql.Date.valueOf("2024-01-01")
    // a1 overlaps b1 across THREE shared hour buckets (must count once),
    // a1 touches b2 at a point (closed semantics -> overlap 0 counts),
    // a2 is disjoint from everything, and b3 belongs to the same user
    // as a1 (self pair -> excluded)
    val a = Seq(
      (1L, day, us("2024-01-01 10:00:00"), us("2024-01-01 14:00:00")),
      (2L, day, us("2024-01-01 20:00:00"), us("2024-01-01 20:30:00")))
      .toDF("user_id", "day", "s", "e")
    val b = Seq(
      (10L, day, us("2024-01-01 11:00:00"), us("2024-01-01 13:30:00")),
      (11L, day, us("2024-01-01 14:00:00"), us("2024-01-01 15:00:00")),
      (1L, day, us("2024-01-01 10:30:00"), us("2024-01-01 11:00:00")))
      .toDF("user_id", "day", "s", "e")
    val got = graft.operators.RangeJoin.intervalOverlap(a, b, 3600L * 1000000)
      .select(col("user_id"), col("b_user_id")).as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L), (1L, 11L)))
    // whole-table reconciliation: bucket lowering == naive same-day join
    val ev = Tables.events(spark, sf("sf0.001"))
    def spans(t: String) = ev.filter(col("event_type") === t)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("e"))
    val va = spans("view"); val vb = spans("error")
    val fast = graft.operators.RangeJoin.intervalOverlap(va, vb, 3600L * 1000000)
      .select(col("day"), col("user_id"), col("b_user_id"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val naive = va.alias("a").join(vb.alias("b"),
        col("a.day") === col("b.day") && col("a.user_id") =!= col("b.user_id") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.day"), col("a.user_id"), col("b.user_id"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(fast === naive && fast.nonEmpty)
  }

  test("fkOrphans: clean star edges report zero; degraded dim counts exactly the dropped keys") {
    import graft.queries.Audit
    val dir = sf("sf0.001")
    val rows = SparkEntry.queries("audit_referential_integrity")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size === 8)
    // every REAL edge of the synthetic star is clean
    rows.filterNot(_._1.contains("degraded")).foreach { case (e, (_, orph)) =>
      assert(orph === 0L, s"unexpected orphans on clean edge $e")
    }
    // the planted edge loses exactly the lineitems whose order key was
    // dropped from the degraded dim (and that matched the full dim)
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .filter(col("l_orderkey") % 1000 === 0).count()
    val (nRows, nOrph) = rows("lineitem.l_orderkey->orders[degraded]")
    assert(nRows === li.count())
    assert(nOrph === expected && nOrph > 0L,
      s"degraded edge orphans $nOrph != expected $expected")
  }

  test("sample quantiles: estimates within the rank-error band, sample size near n/16") {
    val rows = SparkEntry.queries("sketch_sample_quantiles")(spark, sf("sf0.01")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 4)
    val sorted = Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_extendedprice")).as[Double].collect().sorted
    val n = sorted.length
    val (_, _, _, nSample, nTotal) = rows.head
    assert(nTotal === n.toLong)
    // Binomial(n, 1/16): ±5 σ band
    val expS = n / 16.0
    assert(math.abs(nSample - expS) < 5 * math.sqrt(expS),
      s"sample size $nSample far from $expS")
    for ((q, est, exact, _, _) <- rows) {
      // the exact column IS the discrete quantile of the data
      assert(exact === sorted(math.max(0, math.ceil(q * n).toInt - 1)) ||
        exact === sorted(math.min(n - 1, math.ceil(q * n).toInt)),
        s"exact quantile at $q off the data grid")
      // the estimate's RANK in the full data stays within ±2.5% of q·n
      // (Hoeffding/DKW at n/16 samples is far tighter than this)
      val rank = sorted.count(_ <= est)
      assert(math.abs(rank - q * n) <= 0.025 * n,
        s"sample quantile at $q has rank $rank vs ${q * n}")
    }
  }

  test("CSV modes: PERMISSIVE nulls bad cells, FAILFAST throws on the same file") {
    val path = tempDir("csv_modes") + "/data"
    Seq("1,ok", "not_a_number,bad", "3,ok")
      .toDF("value").write.mode("overwrite").text(path)
    val schema = "k LONG, status STRING"
    val permissive = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(path)
    assert(permissive.count() === 3)
    assert(permissive.filter(col("k").isNull).count() === 1)
    val failfast = spark.read.schema(schema).option("mode", "FAILFAST").csv(path)
    // count() prunes every column — the parser never touches the bad
    // cell — so force full-row materialization to trigger the throw
    val e = intercept[org.apache.spark.SparkException] { failfast.collect() }
    assert(e.getMessage != null)
    // DROPMALFORMED silently drops the bad line (again under full
    // projection — a pruned count() parses nothing and drops nothing)
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    assert(dropped.collect().length === 2)
  }

  test("partitioned sink: day filter reaches the scan as a partition filter") {
    val path = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_qtmp", "events_partitioned_spec").toString
    try {
      Tables.events(spark, sf("sf0.001"))
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          to_date(col("ts")).as("day"))
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val df = spark.read.parquet(path)
        .filter(col("day") === lit(java.sql.Date.valueOf("2024-01-15")))
      df.count()
      val scans = collectPlan(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty)
      val scan = scans.head
      assert(scan.partitionFilters.nonEmpty,
        s"day predicate did not become a partition filter:\n${df.queryExecution.executedPlan}")
      // pruning is real: the selected partition count is 1, not |days|
      assert(scan.relation.location.listFiles(scan.partitionFilters, Nil).size === 1)
    } finally Bench.deleteRecursively(path)
  }

  test("dynamic partition pruning fires in the declared DPP query's fact scan") {
    val df = SparkEntry.queries("join_dynamic_partition_prune")(spark, sf("sf0.001"))
    // execute THIS QueryExecution's plan instance (the PlanAudit trick)
    // so its DPP subquery finishes and its metrics populate — a plain
    // df.count() runs a fresh copy and leaves this instance's
    // InSubqueryExec unevaluated
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    val scans = collectPlan(qe.executedPlan)
      .collect { case f: FileSourceScanExec => f }
      .filter(_.partitionFilters.nonEmpty)
    assert(scans.nonEmpty, s"no partition-filtered scan found:\n${qe.executedPlan}")
    val fact = scans.head
    // the filter is the RUNTIME kind (dim-derived subquery), not a literal
    assert(fact.partitionFilters.mkString(",").contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter, got: ${fact.partitionFilters}")
    // pruning is real: the fact scan emitted ONLY the Monday partitions'
    // rows, and Mondays are a strict subset of all days
    val ev = Tables.events(spark, sf("sf0.001"))
    val allRows = ev.count()
    val mondayRows = ev.filter(weekday(to_date(col("ts"))) === 0).count()
    assert(mondayRows < allRows, "fixture vacuous: every row is a Monday")
    assert(fact.metrics("numOutputRows").value === mondayRows,
      s"fact scan read ${fact.metrics("numOutputRows").value} rows, want only $mondayRows")
  }

  test("range-partitioned sorted writer emits key-disjoint files (stats pruning layout)") {
    // The single-column physical-layout complement of zorder_tiles:
    // repartitionByRange + sortWithinPartitions gives every output
    // file a non-overlapping key range, so parquet footer min/max
    // stats can skip whole files for a point/range predicate.
    val path = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_qtmp", "orders_range_sorted").toString
    try {
      Tables.orders(spark, sf("sf0.001"))
        .repartitionByRange(4, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey"))
        .write.mode("overwrite").parquet(path)
      val files = new java.io.File(path).listFiles
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length === 4)
      val ranges = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo, _)) =>
          assert(hi < lo, s"file key ranges overlap: ${ranges.toSeq}")
        case _ =>
      }
    } finally Bench.deleteRecursively(path)
  }

  test("corrupt parquet file: default read throws, ignoreCorruptFiles recovers the good rows") {
    val path = tempDir("graft_corrupt")
    try {
      val n = Tables.region(spark, sf("sf0.001")).count()
      Tables.region(spark, sf("sf0.001")).write.mode("overwrite").parquet(path)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path, "part-99999-garbage.parquet"),
        "this is not a parquet file".getBytes("UTF-8"))
      // default: the broken footer fails the scan (fail-loud is the default)
      val e = intercept[Exception] {
        spark.read.parquet(path).count()
      }
      assert(e.getMessage != null)
      // opted in: the scan skips the corrupt file, good rows intact
      assert(spark.read.option("ignoreCorruptFiles", "true").parquet(path).count() === n)
    } finally Bench.deleteRecursively(path)
  }

  test("small-file compaction: 64 fragments collapse to the byte-target count, rows intact") {
    import graft.queries.Ingest
    val frag = tempDir("graft_frag")
    val out = tempDir("graft_compact")
    try {
      val docs = Tables.documents(spark, sf("sf0.01"))
      docs.repartition(64).write.mode("overwrite").parquet(frag)
      def parts(dir: String): Int =
        new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
      assert(parts(frag) === 64, "fixture must start fragmented")
      // 64 MB target >> the whole table → everything compacts to ONE file
      val nOut = Ingest.compactParquet(spark, frag, out, targetBytes = 64L * 1024 * 1024)
      assert(nOut === 1 && parts(out) === 1,
        s"expected single output file, got nOut=$nOut files=${parts(out)}")
      // lossless: identical row multiset
      val a = spark.read.parquet(out)
      assert(a.count() === docs.count())
      assert(a.exceptAll(docs).count() === 0 && docs.exceptAll(a).count() === 0)
      // a small byte target splits the rewrite into multiple outputs
      val bytes = new java.io.File(frag).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val nSmall = Ingest.compactParquet(spark, frag, out, targetBytes = bytes / 4)
      assert(nSmall >= 4 && parts(out) === nSmall, s"got nSmall=$nSmall files=${parts(out)}")
    } finally {
      Bench.deleteRecursively(frag); Bench.deleteRecursively(out)
    }
  }

  test("preSplitAtDayBoundaries: midnight-spanning intervals, split+overlap == brute force") {
    // VERDICT r9 #2: the day-boundary contract, now enforced in code.
    // Random closed intervals over a 5-day window, lengths up to 36 h
    // so many cross one or two midnights; pair set from
    // preSplit→intervalOverlap must equal the brute-force overlap.
    val dayUs = 86400L * 1000000L
    val rnd = new scala.util.Random(42)
    def mk(ids: Range): Seq[(Long, Long, Long)] = ids.map { i =>
      val s = (rnd.nextDouble() * 5 * dayUs).toLong
      val len = (rnd.nextDouble() * 1.5 * dayUs).toLong // up to 36 h
      (i.toLong, s, s + len)
    }
    val aRows = mk(1 to 40); val bRows = mk(101 to 140)
    def frame(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("user_id", "s", "e")
    val a = RangeJoin.preSplitAtDayBoundaries(frame(aRows))
    val b = RangeJoin.preSplitAtDayBoundaries(frame(bRows))
    // sanity: the fixture really exercises the split (fan-out happened)
    assert(a.count() > aRows.length, "no interval crossed midnight — fixture vacuous")
    val got = RangeJoin.intervalOverlap(a, b, bucketMicros = 3600L * 1000000)
      .select(col("user_id"), col("b_user_id"))
      .distinct().as[(Long, Long)].collect().toSet
    val want = (for {
      (ia, sa, ea) <- aRows; (ib, sb, eb) <- bRows
      if ia != ib && sa <= eb && sb <= ea
    } yield (ia, ib)).toSet
    assert(got === want, s"missing=${want -- got} extra=${got -- want}")
    // sub-intervals partition the original: total covered µs preserved
    val lenSplit = a.agg(sum(col("e") - col("s") + 1)).head().getLong(0)
    val lenOrig = aRows.map { case (_, s, e) => e - s + 1 }.sum
    assert(lenSplit === lenOrig, "split pieces must exactly tile the originals")
  }

  test("observedLoad: metrics ride the sink write — no second scan, values exact") {
    import graft.queries.Ingest
    // Isolated session: the Observation registers in the session's
    // ObservationManager, and a registered entry makes the
    // SparkSession object non-serializable — which breaks any LATER
    // test whose ML closure drags the shared session in via a
    // trainingSummary (QualitySpec, observed as a cross-suite flake).
    // newSession() shares the context but owns a fresh manager.
    val session = spark.newSession()
    val src = Tables.orders(session, sf("sf0.001"))
    val (instrumented, obs) = Ingest.observedLoad(src,
      nullCols = Seq("o_custkey"), sumCols = Seq("o_totalprice"))
    val out = java.nio.file.Files.createTempDirectory("observed_").toString
    try {
      instrumented.write.mode("overwrite").parquet(out) // the ONLY action
      val m = obs.get
      assert(m("rows") === src.count())
      assert(m("nulls_o_custkey") === src.filter(col("o_custkey").isNull).count())
      val want = src.agg(
        sum(col("o_totalprice").cast("decimal(30,6)")).cast("double")).head().getDouble(0)
      assert(m("sum_o_totalprice") === want)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("normalizeTs: NTZ wall-clock is interpreted as UTC under a NON-UTC session zone") {
    // ADVICE r9: a bare NTZ→LTZ cast re-anchors the wall-clock in the
    // session zone — under America/New_York every instant shifted by
    // 4-5 h. normalizeTs now routes through from_utc_timestamp so the
    // parquet wall-clock means UTC no matter the caller's session.
    import org.apache.spark.sql.types.TimestampType
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ntz = Seq("2024-01-15 12:34:56.789", "2024-07-01 00:00:00")
        .toDF("s").select(expr("to_timestamp_ntz(s)").as("ts"))
      val out = Tables.normalizeTs(ntz)
      assert(out.schema("ts").dataType === TimestampType)
      val got = out.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      val want = Seq("2024-01-15T12:34:56.789Z", "2024-07-01T00:00:00Z")
        .map(java.time.Instant.parse)
        .map(i => i.getEpochSecond * 1000000L + i.getNano / 1000L).sorted
      assert(got === want,
        s"NTZ wall-clock not pinned to UTC under non-UTC session: $got vs $want")
      // and the UTC-session fast path agrees with the general path
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val gotUtc = Tables.normalizeTs(
          Seq("2024-01-15 12:34:56.789", "2024-07-01 00:00:00")
            .toDF("s").select(expr("to_timestamp_ntz(s)").as("ts")))
        .select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      assert(gotUtc === want)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
