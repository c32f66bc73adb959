package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.pipeline.Telemetry

/** Golden-value tests for the label/feature semantics on hand-built
  * timelines (FIXTURES.md §2; reference semantics at
  * /root/reference/scripts/02_label_engineering.py:113-131 and
  * 03_feature_engineering.py:96-154). */
class TelemetrySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  /** (event_id, day, user, type, value) → events frame. */
  private def events(rows: (Long, Int, Long, String, Double)*): DataFrame =
    rows.toSeq
      .map { case (id, d, u, t, v) => (id, ts(d), u, t, v, "") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("failing-drive-5d: label 1 exactly on the day before failure; failure-day row dropped") {
    val ev = events(
      (1, 1, 7, "view", 10.0), (2, 2, 7, "view", 11.0), (3, 3, 7, "view", 12.0),
      (4, 4, 7, "view", 13.0), (5, 5, 7, "error", 99.0))
    val lab = Telemetry.labeled(ev).orderBy("event_id")
      .select("event_id", "failure_next").as[(Long, Int)].collect()
    assert(lab.toSeq === Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 0)))
    // F1: the failure-day row is gone after filtering; the label survives.
    val feat = Telemetry.features(ev).orderBy("event_id")
    assert(feat.select("event_id").as[Long].collect().toSeq === Seq(1L, 2L, 3L, 4L))
    assert(feat.filter($"failure_next" === 1).select("event_id").as[Long].collect().toSeq === Seq(4L))
  }

  test("row-frame (not calendar) semantics: gap before failure still labels the previous OBSERVED row") {
    // days 1,2,3,7,8 with failure on day 8: day 7 gets the label despite
    // the 4-day gap (SURVEY §2.6 — frames count observed rows).
    val ev = events(
      (1, 1, 3, "view", 1.0), (2, 2, 3, "view", 2.0), (3, 3, 3, "view", 3.0),
      (4, 7, 3, "view", 4.0), (5, 8, 3, "error", 9.0))
    val lab = Telemetry.labeled(ev).filter($"failure_next" === 1)
      .select("event_id").as[Long].collect()
    assert(lab.toSeq === Seq(4L))
  }

  test("single-row user: stddev null→0, delta null→0, obs_seq=1") {
    val ev = events((1, 1, 9, "view", 5.0))
    val row = Telemetry.features(ev).head()
    assert(row.getAs[Double]("value_std_7") === 0.0)
    assert(row.getAs[Double]("value_delta_1") === 0.0)
    assert(row.getAs[Long]("obs_seq") === 1L)
    assert(row.getAs[Double]("value_mean_7") === 5.0)
  }

  test("features are computed over the FILTERED timeline (reference 02→03 order)") {
    // user 1: error on day 3 between two views. The rolling mean on day 4
    // must average {10, 20} (error-day 99 excluded), not {10, 99, 20}.
    val ev = events(
      (1, 1, 1, "view", 10.0), (2, 3, 1, "error", 99.0), (3, 4, 1, "view", 20.0))
    val feat = Telemetry.features(ev).orderBy("event_id")
    val last = feat.filter($"event_id" === 3).head()
    assert(last.getAs[Double]("value_mean_7") === 15.0)
    assert(last.getAs[Double]("value_delta_1") === 10.0) // 20 - 10, not 20 - 99
    assert(last.getAs[Long]("obs_seq") === 2L)           // 2nd OBSERVED non-error row
  }

  test("flat-vs-spiky: rolling mean/max/std golden values") {
    val flat = (1 to 8).map(d => (d.toLong, d, 1L, "view", 50.0))
    val spiky = (1 to 8).map(d => (100L + d, d, 2L, "view", if (d == 6) 100.0 else 10.0))
    val ev = events(flat ++ spiky: _*)
    val feat = Telemetry.features(ev)
    // flat drive: mean=50, std=0, max=50 everywhere
    val f8 = feat.filter($"event_id" === 8).head()
    assert(f8.getAs[Double]("value_mean_7") === 50.0)
    assert(f8.getAs[Double]("value_std_7") === 0.0)
    assert(f8.getAs[Double]("value_max_7") === 50.0)
    // spiky drive day 8, frame = days 2..8: {10,10,10,10,100,10,10}
    val s8 = feat.filter($"event_id" === 108).head()
    assert(s8.getAs[Double]("value_mean_7") === math.rint((10 * 6 + 100) / 7.0 * 1e6) / 1e6)
    assert(s8.getAs[Double]("value_max_7") === 100.0)
    // day 7 delta: 10 - 100 = -90
    val s7 = feat.filter($"event_id" === 107).head()
    assert(s7.getAs[Double]("value_delta_1") === -90.0)
  }

  test("confusion matrix: one-pass cells reconcile and zero denominators yield 0.0") {
    // Threshold above every rolling mean → zero alerts → tp+fp = 0.
    val ev = events((1, 1, 1, "view", 1.0), (2, 2, 1, "view", 2.0))
    val c = Telemetry.confusion(Telemetry.scored(ev, tau = 1e9)).head()
    assert(c.getAs[Long]("tp") === 0L)
    assert(c.getAs[Long]("fp") === 0L)
    assert(c.getAs[Double]("precision") === 0.0) // guard, not NULL
    assert(c.getAs[Long]("n") === c.getAs[Long]("tp") + c.getAs[Long]("fp") +
      c.getAs[Long]("fn") + c.getAs[Long]("tn"))
  }

  test("alert threshold is >= (boundary inclusive, 06_deployment_code.py:137-140)") {
    val ev = events((1, 1, 1, "view", 60.0), (2, 2, 1, "view", 0.0))
    // event 1: mean=60 → alert at tau=60 (>=). event 2: mean=30 → no alert.
    val alerts = Telemetry.scored(ev, tau = 60.0).orderBy("event_id")
      .select("alert").as[Int].collect()
    assert(alerts.toSeq === Seq(1, 0))
  }

  test("liftTable: conservation, monotone gain, terminal 1.0s, perfect-ranking capture") {
    import org.apache.spark.sql.functions._
    // synthetic scored frame: 100 rows, scores 100..1 descending, the
    // 10 positives sit on the 10 HIGHEST scores — a perfect ranking,
    // so decile 1 captures everything (gain 1.0, lift 10.0)
    val df = (1 to 100).map(i => (i.toLong, (101 - i).toDouble, if (i <= 10) 1 else 0))
      .toDF("event_id", "value_mean_7", "failure_next")
    val rows = Telemetry.liftTable(df).orderBy(col("decile")).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 100L)
    assert(rows.map(_.getAs[Long]("n_pos")).sum === 10L)
    val gains = rows.map(_.getAs[Double]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b }, "gain not monotone")
    assert(gains.head === 1.0 && gains.last === 1.0)
    assert(rows.head.getAs[Double]("lift") === 10.0)
    assert(rows.last.getAs[Double]("lift") === 1.0)
    // tie-block integrity: give every row the SAME score — all mass
    // lands in ONE decile row (ties never split), lift degenerates to 1
    val tied = (1 to 100).map(i => (i.toLong, 42.0, if (i <= 10) 1 else 0))
      .toDF("event_id", "value_mean_7", "failure_next")
    val t = Telemetry.liftTable(tied).collect()
    assert(t.length === 1)
    assert(t.head.getAs[Long]("n") === 100L)
    assert(t.head.getAs[Double]("lift") === 1.0)
  }

  test("isotonicCalibration: PAV pooling exact on hand bins, monotone on the corpus (r12)") {
    import spark.implicits._
    // equal-weight rates {0.1, 0.3, 0.2, 0.4}: the 0.3/0.2 violation
    // pools to 0.25, the ends stay — the textbook PAV case
    val bins = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 2L), (3L, 10L, 4L))
      .toDF("bucket", "n", "n_pos")
    val got = Telemetry.isotonicCalibration(bins).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("iso_cal")).toMap
    assert(got === Map(0L -> 0.1, 1L -> 0.25, 2L -> 0.25, 3L -> 0.4))
    // weights matter: rate-1.0 (n=1) before rate-0 (n=3) pools to 1/4,
    // not to the unweighted 1/2
    val w = Seq((0L, 1L, 1L), (1L, 3L, 0L)).toDF("bucket", "n", "n_pos")
    val gotW = Telemetry.isotonicCalibration(w).collect()
      .map(_.getAs[Double]("iso_cal")).toSeq
    assert(gotW === Seq(0.25, 0.25))
    // an already-monotone curve is a fixed point
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("bucket", "n", "n_pos")
    val gotM = Telemetry.isotonicCalibration(mono).collect()
      .map(_.getAs[Double]("iso_cal")).toSeq
    assert(gotM === Seq(0.1, 0.5, 0.9))
    // corpus run: output is non-decreasing in bucket order (the
    // defining constraint), with bin counts preserved
    val corpus = SparkEntry.queries("ml_isotonic_calibration")(spark, sf("sf0.001"))
      .collect()
    val isoSeq = corpus.map(_.getAs[Double]("iso_cal")).toSeq
    assert(isoSeq.zip(isoSeq.tail).forall { case (a, b) => b >= a }, s"not monotone: $isoSeq")
    assert(corpus.map(_.getAs[Long]("n")).sum > 0)
  }

  test("thresholdMetrics: hand confusion tp=2 fp=1 fn=1 tn=6 gives the textbook scores (r13)") {
    import spark.implicits._
    // (alert, failure_next) multiset: 2×(1,1), 1×(1,0), 1×(0,1), 6×(0,0)
    val scored = (Seq.fill(2)((1, 1)) ++ Seq((1, 0), (0, 1)) ++ Seq.fill(6)((0, 0)))
      .toDF("alert", "failure_next")
    val r = Telemetry.thresholdMetrics(scored).head()
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"), r.getAs[Long]("n")) === ((2L, 1L, 1L, 6L, 10L)))
    assert(r.getAs[Double]("f1") === 0.666667)          // 4/6
    assert(r.getAs[Double]("balanced_acc") === 0.761905) // (2/3 + 6/7)/2
    assert(r.getAs[Double]("youden_j") === 0.52381)      // 2/3 + 6/7 − 1
    assert(r.getAs[Double]("kappa") === 0.52381)         // 2·(12−1)/(21+21)
    assert(r.getAs[Double]("mcc") === 0.52381)           // 11/√(3·3·7·7) = 11/21
    // undefined marginals → sentinels, not NaN/divide-by-zero: no
    // positives at all in truth or prediction
    val allNeg = Seq.fill(4)((0, 0)).toDF("alert", "failure_next")
    val s = Telemetry.thresholdMetrics(allNeg).head()
    assert(s.getAs[Double]("f1") === 0.0)
    assert(s.getAs[Double]("balanced_acc") === -1.0)
    assert(s.getAs[Double]("mcc") === -1.0)
  }

  test("calibrationError: ECE = Σ|pos−Σs|/N on hand bins; degenerate equal-score frame (r13)") {
    import spark.implicits._
    // scores span [0,1] so s01 = score; only the 0.2-score row is
    // miscalibrated (predicted 0.2, observed 1) → ECE = 0.8/5, MCE = 0.8
    val scored = Seq((0.0, 0), (0.2, 1), (0.5, 1), (0.5, 0), (1.0, 1))
      .toDF("value_mean_7", "failure_next")
    val rows = Telemetry.calibrationError(scored).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq === Seq(0L, 2L, 5L, 9L))
    val b2 = rows.find(_.getAs[Long]("bucket") == 2L).get
    assert(b2.getAs[Double]("conf") === 0.2)
    assert(b2.getAs[Double]("acc") === 1.0)
    assert(b2.getAs[Double]("gap") === 0.8)
    assert(rows.head.getAs[Double]("ece_total") === 0.16) // 0.8/5
    assert(rows.head.getAs[Double]("mce_total") === 0.8)
    // hi == lo: every row lands in bucket 0 at s01 = 0.5 — no NaN from
    // the zero-width range
    val flat = Seq((0.3, 1), (0.3, 0), (0.3, 0), (0.3, 0))
      .toDF("value_mean_7", "failure_next")
    val f = Telemetry.calibrationError(flat).collect()
    assert(f.length === 1 && f.head.getAs[Long]("bucket") === 0L)
    assert(f.head.getAs[Double]("conf") === 0.5)
    assert(f.head.getAs[Double]("acc") === 0.25)
    assert(f.head.getAs[Double]("ece_total") === 0.25) // |1 − 2.0|/4
  }
}
