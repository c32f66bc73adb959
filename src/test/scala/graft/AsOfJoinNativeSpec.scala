package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def probe = Seq(
    // key 1: before any build row, on a tie, after
    (1L, ts("2024-01-01 00:00:00"), "p0"),
    (1L, ts("2024-01-02 00:00:00"), "p1"), // tie with build b1 (inclusive)
    (1L, ts("2024-01-03 12:00:00"), "p2"),
    // key 2: only later build rows exist -> always null
    (2L, ts("2024-01-01 00:00:00"), "p3"),
    // key 3: no build rows at all
    (3L, ts("2024-01-05 00:00:00"), "p4"))
    .toDF("k", "t", "tag")

  private def build = Seq(
    (1L, ts("2024-01-02 00:00:00"), 10.0), // b1
    (1L, ts("2024-01-03 00:00:00"), 20.0), // b2
    (2L, ts("2024-06-01 00:00:00"), 99.0))
    .toDF("k", "t", "v")

  test("fixture semantics: inclusive ties, pre-build nulls, per-key isolation") {
    val got = AsOfJoinNative.asof(probe, build, key = "k", tsCol = "t")
      .orderBy("k", "t")
      .select("tag", "v")
      .collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq
    assert(got === Seq(
      ("p0", None),        // before b1
      ("p1", Some(10.0)),  // tie with b1 matches (inclusive)
      ("p2", Some(20.0)),  // latest at-or-before is b2
      ("p3", None),        // build exists but only later
      ("p4", None)))       // no build rows for the key
  }

  test("row-for-row parity with the composed union+window operator on real data") {
    val (b, pub) = AsOfJoin.asofInputs(spark, sf("sf0.001"))
    val composed = AsOfJoin.asofBackward(b, pub, "user_id", "ts")
      .orderBy("event_id").collect().toSeq
    val native = AsOfJoinNative.asof(b, pub, "user_id", "ts")
      .orderBy("event_id").collect().toSeq
    assert(native === composed)
    assert(native.nonEmpty)
  }

  test("plan: native exec node present, each side shuffles once in its own schema") {
    val df = AsOfJoinNative.asof(probe, build, key = "k", tsCol = "t")
    df.collect()
    val nodes = collectPlan(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), "native exec node missing:\n" +
      df.queryExecution.executedPlan)
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles === 2, s"expected one exchange per side, got $shuffles")
    // no union padding, no window, no post-filter in the native plan
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window") && !s.contains("Union"),
      s"native plan should not fall back to the union+window rewrite:\n$s")
  }

  test("probe-side filters push below the custom node; payload filters stay above") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    import graft.plans.AsOfJoinPlan
    val joined = AsOfJoinNative.asof(probe, build, key = "k", tsCol = "t")
    // probe-side (tag) pushes; payload-side (v) must NOT
    val filtered = joined.filter(col("tag") =!= "p9" && col("v").isNotNull)
    val opt = filtered.queryExecution.optimizedPlan
    val ajNodes = opt.collect { case aj: AsOfJoinPlan => aj }
    assert(ajNodes.size === 1)
    val belowFilters = ajNodes.head.left.collect { case f: LFilter => f }
    assert(belowFilters.exists(_.condition.toString.contains("tag")),
      s"probe-side conjunct was not pushed below the as-of join:\n$opt")
    val aboveFilter = opt.collectFirst { case f: LFilter if f.condition.toString.contains("v") => f }
    assert(aboveFilter.nonEmpty, s"payload conjunct must stay above the join:\n$opt")
    assert(!belowFilters.exists(_.condition.toString.contains(" v")),
      s"payload conjunct leaked below the join:\n$opt")
    // semantics unchanged vs filtering the composed operator's output
    val want = AsOfJoin.asofBackward(probe, build, "k", "t")
      .filter(col("tag") =!= "p9" && col("v").isNotNull)
      .orderBy("k", "t").collect().toSeq
    val got = filtered.orderBy("k", "t").collect().toSeq
    assert(got === want)
  }

  test("self-derived right side (shared lineage) is deduplicated, not rejected") {
    val left = probe
    val right = probe.groupBy(col("k"), col("t")).agg(count(lit(1)).cast("double").as("v"))
    // same source => overlapping expr ids before dedup; must still run
    val out = AsOfJoinNative.asof(left, right.select("k", "t", "v"), "k", "t")
    assert(out.count() === left.count())
  }
}
