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
}
