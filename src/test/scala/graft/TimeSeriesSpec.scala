package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.TimeSeries

/** Round-10 irregular-time-series operators: sweep-line concurrency,
  * TWAP, CUSUM — hand fixtures pin the semantics the oracle can only
  * hash, plus a brute-force recursion check for the CUSUM identity. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("concurrencyPeak: overlapping sessions stack, inclusive interval semantics") {
    // u10: one session 00:00..00:10; u20: 00:05..00:12 (covers u10's
    // end); u30: a point session exactly AT u10's end instant —
    // [start,end] is inclusive, so at 00:10 all three are open.
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:10:00")),
      (3L, 20L, ts("2024-01-01 00:05:00")),
      (4L, 20L, ts("2024-01-01 00:12:00")),
      (5L, 30L, ts("2024-01-01 00:10:00")),
      // next day, one lone session -> peak 1 on its own day row
      (6L, 10L, ts("2024-01-02 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = TimeSeries.concurrencyPeak(e)
      .orderBy(col("day"))
      .select(col("day").cast("string"), col("peak_concurrency"))
      .as[(String, Long)].collect().toSeq
    assert(got === Seq("2024-01-01" -> 3L, "2024-01-02" -> 1L))
  }

  test("concurrencyPeak: disjoint sessions of one user never overlap themselves") {
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (2L, 10L, ts("2024-01-01 02:00:00")), // > 30 min gap -> new session
      (3L, 10L, ts("2024-01-01 04:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = TimeSeries.concurrencyPeak(e)
      .select(col("peak_concurrency")).as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("twap: interval weights are the gap to the successor; last sample drops") {
    // 10.0 held 30 s, then 20.0 held 10 s, then a final sample (no
    // successor, contributes nothing): twap = (10*30 + 20*10) / 40 = 12.5
    val e = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 10.0),
      (2L, 10L, ts("2024-01-01 00:00:30"), 20.0),
      (3L, 10L, ts("2024-01-01 00:00:40"), 99.0))
      .toDF("event_id", "user_id", "ts", "value")
    val row = TimeSeries.twap(e).collect().head
    assert(row.getAs[Long]("n_intervals") === 2L)
    assert(row.getAs[Long]("span_us") === 40000000L)
    assert(row.getAs[Double]("twap") === 12.5)
  }

  test("twap: a single-sample user-day yields no row (no observed span)") {
    val e = Seq((1L, 10L, ts("2024-01-01 00:00:00"), 10.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(TimeSeries.twap(e).count() === 0L)
  }

  test("cusum: prefix-sum identity equals the sequential recursion on random series") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      u <- 1L to 5L
      i <- 1 to 40
    } yield (u * 1000 + i, u, ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
      math.rint(rnd.nextGaussian() * 400) / 100.0 + 5.0)
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val h = 6.0
    val got = TimeSeries.cusumAlarms(df, h).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("max_cusum"), r.getAs[Long]("n_alarms"),
          r.getAs[Long]("first_alarm_event")))).toMap

    // Driver-side reference: the literal Page recursion over the same
    // 6-dp-quantized deviations the engine accumulates.
    // mirror the engine exactly: decimal(30,6) sum -> double -> ÷ count
    val mu = rows.map(v => BigDecimal(v._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble / rows.size
    rows.groupBy(_._2).foreach { case (u, rs) =>
      var s = BigDecimal(0)
      var mx = BigDecimal(0)
      var nAlarm = 0L
      var first = -1L
      rs.sortBy(r => (r._3.getTime, r._1)).foreach { r =>
        val dev = BigDecimal(r._4 - mu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        s = (s + dev).max(BigDecimal(0))
        mx = mx.max(s)
        if (s > h) { nAlarm += 1; if (first < 0) first = r._1 }
      }
      val (gMax, gN, gFirst) = got(u)
      assert(math.abs(gMax - mx.toDouble) < 1e-6, s"user $u max")
      assert(gN === nAlarm, s"user $u alarms")
      assert(gFirst === first, s"user $u first alarm")
    }
  }

  test("cusum: drift above the mean alarms, the reset after a dip is real") {
    // Values chosen so the global mean is EXACTLY 10 (u1: 26×10; u2:
    // 12×15 − 82.5 + 13×12.5 = 260) and every deviation is an exact
    // decimal. u1 sits on the mean (never alarms). u2 drifts +5/sample:
    // S = 5i crosses h = 50 at i = 11 (event 210) and again at i = 12 —
    // two alarms; the −92.5 dip clamps S to 0, and the post-dip run's
    // total drift 13 × 2.5 = 32.5 stays under h — no third alarm.
    val u1 = (1 to 26).map(i => (100L + i, 1L, ts(f"2024-01-01 00:00:$i%02d"), 10.0))
    val u2v = Seq.fill(12)(15.0) ++ Seq(-82.5) ++ Seq.fill(13)(12.5)
    val u2 = u2v.zipWithIndex.map { case (v, i) =>
      (200L + i, 2L, ts(f"2024-01-01 00:00:${i + 1}%02d"), v)
    }
    val df = (u1 ++ u2).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.cusumAlarms(df, h = 50.0).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_alarms"), r.getAs[Long]("first_alarm_event")))).toMap
    assert(got(1L) === ((0L, -1L)))
    assert(got(2L) === ((2L, 210L)))
  }

  test("sloBurn: pages only when BOTH windows burn; sustained-but-recovered stays silent") {
    // Hour 0-4: clean baseline (100 events, 0 errors each hour).
    // Hour 5: catastrophic hour — 30 errors / 100 events: burn_1h =
    // 30 > 14.4 AND burn_6h = 30/600·100 = 5.0 < 6 → 6h window not
    // yet burning → NO page (a blip must sustain).
    // Hour 6: still failing — 40/100: burn_1h = 40, 6h window now
    // (30+40)/600·100 = 11.67 > 6 → PAGE.
    // Hour 7: recovered — 0/100: burn_1h = 0 → no page even though
    // the 6h window still carries the incident.
    def mk(h: Int, errs: Int, tot: Int) = (0 until tot).map { j =>
      (h * 1000L + j, 1L, ts(f"2024-01-01 $h%02d:00:${j % 60}%02d"),
        if (j < errs) "error" else "view", 1.0)
    }
    val rows = (0 to 4).flatMap(mk(_, 0, 100)) ++
      mk(5, 30, 100) ++ mk(6, 40, 100) ++ mk(7, 0, 100)
    val e = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = TimeSeries.sloBurn(e).orderBy(col("hr")).collect()
      .map(r => r.getAs[Long]("hr") % 24 -> r.getAs[Long]("page")).toMap
    assert(got(5L) === 0L, "one catastrophic hour alone must not page (long window gate)")
    assert(got(6L) === 1L, "sustained fast burn must page")
    assert(got(7L) === 0L, "recovered hour must not page (short window gate)")
    assert((0L to 4L).forall(got(_) === 0L))
  }

  test("interpolateDaily: interior gaps get the bracket line, observed days the exact mean") {
    // u1 observes day 1 (mean 10), day 4 (mean 40), day 5 (mean 20):
    // days 2,3 interpolate the 1→4 line (20, 30); day 5 is observed.
    // Day-4 mean comes from TWO events (35 + 45) — exercises the
    // per-day mean, not just single samples.
    val e = Seq(
      (1L, 1L, ts("2024-03-01 08:00:00"), 10.0),
      (2L, 1L, ts("2024-03-04 08:00:00"), 35.0),
      (3L, 1L, ts("2024-03-04 09:00:00"), 45.0),
      (4L, 1L, ts("2024-03-05 08:00:00"), 20.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.interpolateDaily(e).orderBy(col("day"))
      .select(col("day").cast("string"), col("observed"), col("value_filled"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-03-01", 1L, 10.0),
      ("2024-03-02", 0L, 20.0),
      ("2024-03-03", 0L, 30.0),
      ("2024-03-04", 1L, 40.0),
      ("2024-03-05", 1L, 20.0)))
  }

  test("interpolateDaily: a fully-dense user is returned verbatim (no spine rows invented)") {
    val e = Seq(
      (1L, 7L, ts("2024-03-01 00:00:00"), 5.0),
      (2L, 7L, ts("2024-03-02 00:00:00"), 6.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.interpolateDaily(e).collect()
    assert(got.length === 2)
    assert(got.forall(_.getAs[Long]("observed") === 1L))
  }

  test("rollingSlope: linear ramp recovers its step; constant series slopes zero") {
    // u1 = 3, 5, 7, 9 (slope 2 per index everywhere); u2 constant.
    val e = (1 to 4).map(i => (10L + i, 1L, ts(f"2024-01-01 00:00:$i%02d"), 1.0 + 2.0 * i)) ++
      (1 to 3).map(i => (20L + i, 2L, ts(f"2024-01-01 00:00:$i%02d"), 4.0))
    val got = TimeSeries.rollingSlope(e.toDF("event_id", "user_id", "ts", "value"))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("trend_slope")).toMap
    // first row of each user (n=1) excluded
    assert(!got.contains(11L) && !got.contains(21L))
    assert(got(12L) === 2.0 && got(13L) === 2.0 && got(14L) === 2.0)
    assert(got(22L) === 0.0 && got(23L) === 0.0)
  }

  test("ewma: dyadic weights renormalize exactly on short frames") {
    // [2, 4]: row 1 → 2.0; row 2 → (4·½ + 2·¼)/(¾) = 10/3 ≈ 3.333333.
    val e = Seq(
      (1L, 1L, ts("2024-01-01 00:00:01"), 2.0),
      (2L, 1L, ts("2024-01-01 00:00:02"), 4.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewma(e).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    assert(got(1L) === 2.0)
    assert(got(2L) === 3.333333)
  }

  test("ewma: beyond 20 lags the window forgets exactly (truncation is the definition)") {
    // 25 samples: first 5 are a huge level (1000), the rest 0. At row
    // 25, lags 0..19 are all zeros (rows 6..25) — the EWMA is exactly
    // 0: the 1000s fell off the 20-lag window entirely.
    val e = (1 to 25).map(i =>
      (i.toLong, 1L, ts(f"2024-01-01 00:00:$i%02d"), if (i <= 5) 1000.0 else 0.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.ewma(e).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma")).toMap
    assert(got(25L) === 0.0)
    // and at row 6 the previous five 1000s still dominate: weight of
    // the zero at lag 0 is ½, the rest is (¼+…+2⁻⁶)/(1−2⁻⁶) of 1000
    assert(got(6L) > 400.0 && got(6L) < 500.0)
  }

  test("holt backtest: hand-computed recurrence on a 3-day series (r12)") {
    import java.sql.Timestamp
    // one event per day with values 10, 20, 30 (means = values):
    //   t1: l=10, b=0
    //   t2: f=10,  err=10;   l=½·20+½·10=15,      b=½·(15−10)+0=2.5
    //   t3: f=17.5, err=12.5; l=½·30+½·17.5=23.75, b=½·(23.75−15)+1.25=5.625
    // MAE = 22.5/2 = 11.25 — all dyadic, so the doubles are EXACT
    val day0 = Timestamp.valueOf("2024-03-01 12:00:00")
    def ts(d: Int) = new Timestamp(day0.getTime + d * 86400000L)
    val ev = Seq(
      (1L, ts(0), 7L, "view", 10.0, ""),
      (2L, ts(1), 7L, "view", 20.0, ""),
      (3L, ts(2), 7L, "view", 30.0, ""),
      (4L, ts(0), 8L, "view", 5.0, "")) // 1-day series → sentinel MAE
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // rebuild the declared query's exact pipeline on the fixture
    val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(expr(
        """(2 * SUM(CAST(CAST(value AS DECIMAL(20,6)) * 1000000 AS BIGINT))
          | + COUNT(*)) div (2 * COUNT(*))""".stripMargin).as("m_us"))
    val got = daily.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("m_us")))).as("s"))
      .withColumn("st", expr(
        """aggregate(
          |  s,
          |  named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE),
          |               'es', CAST(0.0 AS DOUBLE), 'n', 0),
          |  (acc, x) -> CASE WHEN acc.n = 0
          |    THEN named_struct('l', CAST(x.m_us AS DOUBLE), 'b', CAST(0.0 AS DOUBLE),
          |                      'es', CAST(0.0 AS DOUBLE), 'n', 1)
          |    ELSE named_struct(
          |      'l', CAST(0.5 AS DOUBLE) * CAST(x.m_us AS DOUBLE)
          |             + CAST(0.5 AS DOUBLE) * (acc.l + acc.b),
          |      'b', CAST(0.5 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * CAST(x.m_us AS DOUBLE)
          |             + CAST(0.5 AS DOUBLE) * (acc.l + acc.b)) - acc.l)
          |             + CAST(0.5 AS DOUBLE) * acc.b,
          |      'es', acc.es + abs(CAST(x.m_us AS DOUBLE) - (acc.l + acc.b)),
          |      'n', acc.n + 1)
          |    END)""".stripMargin))
      .select(col("user_id"), col("st.l"), col("st.b"), col("st.es"), col("st.n"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap
    // µ-unit means: value·1e6 exactly (one event per day, half-up exact)
    assert(got(7L) === ((23750000.0, 5625000.0, 22500000.0, 3)))
    assert(got(8L) === ((5000000.0, 0.0, 0.0, 1)))
  }

  test("theilSenSlope: odd/even medians exact; outlier day cannot drag the slope (r12)") {
    def ev(id: Long, u: Long, day: Int, v: Double) =
      (id, u, ts(f"2024-01-$day%02d 12:00:00"), v)
    // u1: days 1..3 values 0/10/40 → pair slopes {10, 20, 30} µ/day·10⁶,
    // odd count → median 20e6 exactly.
    // u2: days 1..4 values 0/10/40/40 → slopes {10, 20, 40/3, 30, 15, 0}
    // sorted {0, 10, 40/3, 15, 20, 30}, even count → (40/3 + 15)/2 µ.
    // u3: linear ramp +5/day with day 4 a 1000× outlier: 4 of 10 pair
    // slopes touch the outlier, the median stays the clean trend 5e6 —
    // the 29% breakdown point in action (OLS would move by ~10⁸).
    val e = (Seq(
      ev(1, 1, 1, 0), ev(2, 1, 2, 10), ev(3, 1, 3, 40),
      ev(4, 2, 1, 0), ev(5, 2, 2, 10), ev(6, 2, 3, 40), ev(7, 2, 4, 40)) ++
      Seq(1, 2, 3, 5, 6).map(d => ev(10L + d, 3L, d, 5.0 * d)) :+
      ev(14, 3, 4, 5000.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.theilSenSlope(e).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("slope_med_micro")))).toMap
    assert(got(1L) === ((3L, 3L, 20000000L)))
    val evenMed = (40e6 / 3.0 + 15e6) / 2.0
    assert(got(2L) === ((4L, 6L, math.floor(evenMed + 0.5).toLong)))
    assert(got(3L) === ((6L, 15L, 5000000L)))
    // a single-day user yields no pairs and no row
    val lone = Seq(ev(20, 9, 1, 3.0)).toDF("event_id", "user_id", "ts", "value")
    assert(TimeSeries.theilSenSlope(lone).count() === 0L)
  }

  test("mannKendall: monotone series hit ±S_max, constants zero out, ties correct Var (r12)") {
    def ev(id: Long, u: Long, day: Int, v: Double) =
      (id, u, ts(f"2024-01-$day%02d 12:00:00"), v)
    // u1 strictly increasing over 4 days → S = 6, var18 = 4·3·13 = 156;
    // u2 strictly decreasing → S = −6; u3 constant → S = 0, var18 = 0
    // (one tie group of 4 cancels the n-term exactly);
    // u4 = {1, 1, 2} → one tie pair: S = 2, var18 = 3·2·11 − 2·1·9 = 48
    val e = (1 to 4).map(d => ev(d.toLong, 1, d, d * 10.0)) ++
      (1 to 4).map(d => ev(10L + d, 2, d, 50.0 - d * 10.0)) ++
      (1 to 4).map(d => ev(20L + d, 3, d, 7.0)) ++
      Seq(ev(31, 4, 1, 1.0), ev(32, 4, 2, 1.0), ev(33, 4, 3, 2.0))
    val got = TimeSeries.mannKendall(e.toDF("event_id", "user_id", "ts", "value"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("s_stat"), r.getAs[Long]("var18"), r.getAs[Long]("z_micro")))).toMap
    def z(s: Long, var18: Long): Long =
      math.floor((s - s.sign).toDouble / math.sqrt(var18.toDouble / 18.0) * 1e6 + 0.5).toLong
    assert(got(1L) === ((6L, 156L, z(6, 156))))
    assert(got(2L) === ((-6L, 156L, z(-6, 156))))
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(4L) === ((2L, 48L, z(2, 48))))
    // antisymmetry: reversing the trend flips S and z exactly
    assert(got(1L)._1 === -got(2L)._1 && got(1L)._3 === -got(2L)._3)
  }
}
