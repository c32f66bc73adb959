package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Telemetry, TrainingData}

/** Invariant tests for the non-oracle (sampling) operators
  * (SURVEY §5.2.1/5.2.3; reference
  * /root/reference/scripts/04_prepare_training_data.py:34-68). */
class TrainingDataSpec extends SparkSpec {

  private lazy val feat: DataFrame =
    Telemetry.features(Tables.events(spark, sf("sf0.001"))).cache()

  test("chronological splits are disjoint and exhaustive") {
    val n = feat.count()
    val nt = TrainingData.train(feat).count()
    val nv = TrainingData.valid(feat).count()
    val ns = TrainingData.test(feat).count()
    assert(nt + nv + ns === n)
    assert(nt > 0 && nv > 0 && ns > 0)
    // pairwise disjoint by construction of the predicates; verify anyway
    // via max(train.ts) < min(valid.ts) ordering
    val maxTrain = TrainingData.train(feat).agg(max("ts")).head().getTimestamp(0)
    val minValid = TrainingData.valid(feat).agg(min("ts")).head().getTimestamp(0)
    assert(maxTrain.before(minValid))
  }

  test("downsampled keeps ALL positives and bounds negatives near ratio:1") {
    val t = TrainingData.train(feat)
    val posBefore = TrainingData.positives(t).count()
    val negBefore = TrainingData.negatives(t).count()
    val ratio = 2.0 // test data is ~24% positive; small ratio exercises a real subsample
    val bal = TrainingData.downsampled(t, ratio = ratio, seed = 42L).cache()
    val pos = bal.filter(col("failure_next") === 1).count()
    val neg = bal.filter(col("failure_next") === 0).count()
    assert(pos === posBefore) // every positive survives
    val expectedNeg = math.min(negBefore.toDouble, posBefore * ratio)
    // Bernoulli sampling: allow 5 sigma around the expected count
    val sigma = math.sqrt(expectedNeg)
    assert(math.abs(neg - expectedNeg) <= 5 * sigma + 1,
      s"neg=$neg expected≈$expectedNeg")
    bal.unpersist()
  }

  test("downsampled is deterministic for a fixed seed (within Spark)") {
    val t = TrainingData.train(feat)
    val a = TrainingData.downsampled(t, 2.0, 42L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = TrainingData.downsampled(t, 2.0, 42L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    val c = TrainingData.downsampled(t, 2.0, 43L)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a !== c) // a different seed draws a different sample
  }

  test("rand top-k sample: exact size, negatives only, deterministic for fixed seed") {
    val q = SparkEntry.queries("sample_topk_rand")
    val a = q(spark, sf("sf0.001"))
    assert(a.filter(col("failure_next") =!= 0).count() === 0)
    val ids1 = a.select("event_id").collect().map(_.getLong(0)).toSet
    val ids2 = q(spark, sf("sf0.001")).select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    assert(ids1.size <= 2000)
  }

  test("weighted ES sampling: heavy rows dominate, deterministic, top-k plan") {
    import spark.implicits._
    val weighted = ((0L until 100L).map(i => (i, 100L)) ++
      (100L until 200L).map(i => (i, 1L))).toDF("doc_id", "w")
    val top = TrainingData.weightedSample(weighted, k = 32)
    val ids = top.select("doc_id").as[Long].collect().toSet
    val heavy = ids.count(_ < 100L)
    assert(heavy >= 25, s"weight-100 rows should dominate the sample: $heavy/32 heavy")
    // deterministic: the identical sample on rerun (hash uniforms, no RNG)
    val again = TrainingData.weightedSample(weighted, k = 32)
      .select("doc_id").as[Long].collect().toSet
    assert(again === ids)
    // distributed top-k, not a global sort/window over all rows
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("no temporal leakage: mutating a strictly-future row never changes features at time T") {
    import spark.implicits._
    // 10-day timeline; perturb day 9's value; features for days 1..8 are identical.
    def mk(day9: Double): DataFrame =
      (1 to 10).map(d => (d.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        1L, "view", if (d == 9) day9 else d * 1.0, ""))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val before = Telemetry.features(mk(9.0)).filter($"event_id" <= 8)
      .orderBy("event_id").collect().toSeq
    val after = Telemetry.features(mk(9999.0)).filter($"event_id" <= 8)
      .orderBy("event_id").collect().toSeq
    assert(before === after)
  }

  test("targetEncodeFolds: own fold excluded exactly, smoothing pulls toward the prior") {
    import spark.implicits._
    // seg A: fold0 = {1,0}, fold1 = {1}; seg B: fold0 = {0}.
    // N=4, P=2, α=10:
    //   enc(A,0) = ((2−1)·4 + 10·2) / (4·((3−2)+10)) = 24/44 = 6/11
    //   enc(A,1) = ((2−1)·4 + 10·2) / (4·((3−1)+10)) = 24/48 = 1/2
    //   enc(B,0) = ((0−0)·4 + 10·2) / (4·((1−1)+10)) = 20/40 = 1/2
    val r = Seq(("A", 0L, 1L), ("A", 0L, 0L), ("A", 1L, 1L), ("B", 0L, 0L))
      .toDF("seg", "fold", "y")
    val got = TrainingData.targetEncodeFolds(r, alpha = 10)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (s, f, n, p, e) => (s, f) -> ((n, p, e)) }.toMap
    assert(got(("A", 0L)) === ((2L, 1L, 6.0 / 11.0)))
    assert(got(("A", 1L)) === ((1L, 1L, 0.5)))
    assert(got(("B", 0L)) === ((1L, 0L, 0.5)))
    // leakage check: a label flip in fold f moves every OTHER fold's
    // encoding of that segment but never fold f's own numerator count
    val r2 = Seq(("A", 0L, 0L), ("A", 0L, 0L), ("A", 1L, 1L), ("B", 0L, 0L))
      .toDF("seg", "fold", "y")
    val got2 = TrainingData.targetEncodeFolds(r2, alpha = 10)
      .as[(String, Long, Long, Long, Double)].collect()
      .map { case (s, f, n, p, e) => (s, f) -> ((n, p, e)) }.toMap
    // fold0's own rows changed (1 pos → 0) but enc(A,0) depends only on
    // fold1 (+ global): ((1−0)·4 + 10·1)/(4·((3−2)+10)) = 14/44 = 7/22
    assert(got2(("A", 0L)) === ((2L, 0L, 7.0 / 22.0)))
  }

  test("conformalReport: exact order-statistic q̂, cold-start fallback, coverage count") {
    import spark.implicits._
    // grp 1 train = {100, 200} → pred = 150 (floor-div); global = 150.
    // cal scores (|cents − 150|) = {10, 20, ..., 90}: n_cal = 9,
    // k = ⌈(9+1)·0.9⌉ = 9 → q̂ = 90.
    val train = Seq((1L, 100L), (1L, 200L)).map { case (g, c) => ("train", g, c) }
    val cal = (1 to 9).map(i => ("cal", 1L, 150L + 10L * i))
    // test: scores 0 (covered), 90 (covered, boundary), 91 (not);
    // the score-91 row uses an UNSEEN grp → global fallback pred 150.
    val test = Seq(("test", 1L, 150L), ("test", 1L, 240L), ("test", 99L, 241L))
    val rows = (train ++ cal ++ test).toDF("split", "grp", "cents")
    val r = TrainingData.conformalReport(rows, covMicro = 900000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r === ((2L, 9L, 3L, 90L, 180L, 2L, 666666L)))
    // lower target coverage → strictly smaller order statistic:
    // k = ⌈10·0.5⌉ = 5 → q̂ = 50, and only score-0 is covered
    val r2 = TrainingData.conformalReport(rows, covMicro = 500000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r2._4 === 50L && r2._6 === 1L)
    // tied calibration scores collapse into one histogram cell but
    // still count individually toward the order statistic: nine copies
    // of score 10 → k = 9 reached inside the single cell, q̂ = 10
    val tied = (train ++ (1 to 9).map(_ => ("cal", 1L, 160L)) ++ test)
      .toDF("split", "grp", "cents")
    val r3 = TrainingData.conformalReport(tied, covMicro = 900000L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    assert(r3._4 === 10L && r3._2 === 9L)
  }
}
