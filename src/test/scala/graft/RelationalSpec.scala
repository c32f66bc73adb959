package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Plan-shape and reconciliation tests for the relational surface —
  * the "would this survive 100×" asserts (VERDICT r1 next-round #4:
  * assert broadcast via queryExecution, not visually). */
class RelationalSpec extends SparkSpec {

  test("join_broadcast_dim plans a BroadcastHashJoin and never shuffles the fact side") {
    val df = SparkEntry.queries("join_broadcast_dim")(spark, sf("sf0.001"))
    df.count() // finalize AQE
    val nodes = collectPlan(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"no BroadcastHashJoin in:\n${df.queryExecution.executedPlan}")
    // the only shuffles allowed are for the final groupBy/orderBy, both
    // AFTER the join — the scan→join path itself must be shuffle-free.
    val joinNode = nodes.collectFirst { case j: BroadcastHashJoinExec => j }.get
    assert(collectPlan(joinNode).count(_.isInstanceOf[ShuffleExchangeExec]) === 0,
      "fact side shuffled before the broadcast join")
  }

  test("semi + anti partition orders exactly (reconciliation)") {
    val total = Tables.orders(spark, sf("sf0.001")).count()
    val withLi = Tables.orders(spark, sf("sf0.001"))
      .join(Tables.lineitem(spark, sf("sf0.001")),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val withoutLi = SparkEntry.queries("join_anti")(spark, sf("sf0.001")).count()
    assert(withLi + withoutLi === total)
    assert(withoutLi > 0, "anti join is vacuous on this data")
  }

  test("no CartesianProduct in any declared query plan") {
    // 1-row broadcast probe joins (vector-search pattern) are legitimate
    // cross joins: the broadcast side is a single row by construction.
    val probeJoins = Set("embed_cosine_topk", "embed_ann_topk", "embed_ivf_topk")
    for (q <- SparkEntry.all if !probeJoins.contains(q.name)) {
      val df = q.run(spark, sf("sf0.001"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("Join Cross") && !plan.contains("CartesianProduct"),
        s"cartesian product in ${q.name}")
    }
  }

  test("parquet scans prune columns (ReadSchema ⊂ table schema)") {
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sf("sf0.001"))
    val scan = df.queryExecution.executedPlan.toString
    // 4 of 11 lineitem columns needed; the scan must not read the rest
    assert(!scan.contains("l_shipdate"), "unpruned column in scan:\n" + scan)
    assert(!scan.contains("l_partkey"), "unpruned column in scan:\n" + scan)
  }

  test("chronological split filter is pushed to the parquet scan") {
    val df = Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_totalprice") > 50000.0)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,50000.0)]"),
      s"filter not pushed:\n$physical")
  }
}
