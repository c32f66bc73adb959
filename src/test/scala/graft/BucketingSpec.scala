package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join story for repeated fact-fact joins at
  * scale (SURVEY §2.4 engine surface; builder-prompt "bucketing for
  * co-located joins"). Writing both sides bucketed by the join key means
  * the join needs NO exchange at read time — the shuffle is paid once at
  * write time and amortized over every subsequent join. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join runs without any shuffle exchange") {
    val wh = tempDir("graft_warehouse")
    // pay the shuffle once, at write time (external-table paths under a
    // scratch dir; warehouse conf is static and stays untouched):
    Tables.orders(spark, sf("sf0.001"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sf("sf0.001"))
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      joined.count() // finalize AQE
      val shuffles = collectPlan(joined.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles === 0,
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // reconciliation: bucketed result == unbucketed result
      val direct = Tables.orders(spark, sf("sf0.001"))
        .join(Tables.lineitem(spark, sf("sf0.001")),
          col("o_orderkey") === col("l_orderkey"))
        .count()
      val bucketed = spark.table("orders_b")
        .join(spark.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(bucketed === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("declared join_bucketed_colocated plans no exchange below the sort-merge join") {
    val df = SparkEntry.queries("join_bucketed_colocated")(spark, sf("sf0.001"))
    df.count() // finalize AQE
    val smjs = collectPlan(df.queryExecution.executedPlan)
      .collect { case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(smjs.nonEmpty,
      s"expected a SortMergeJoin (merge hint):\n${df.queryExecution.executedPlan}")
    // the join's whole input subtree must be exchange-free — the
    // bucketed layout, not a shuffle, satisfies its distribution
    // requirement (the final 3-key status rollup above it may exchange)
    val below = smjs.flatMap(j => j.children.flatMap(collectPlan))
    assert(below.count(_.isInstanceOf[ShuffleExchangeExec]) === 0,
      s"bucketed join input shuffles:\n${df.queryExecution.executedPlan}")
  }

  test("salted aggregation plans two aggregate phases and matches the plain result") {
    val salted = SparkEntry.queries("agg_salted_sum")(spark, sf("sf0.001"))
    val plain = Tables.lineitem(spark, sf("sf0.001"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("decimal(30,6)")).cast("double").as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
    assert(salted.collect().toSeq === plain.collect().toSeq)
    // plan shape: two distinct groupBys → at least 3 HashAggregates
    // (partial+final on (key,salt), then on key)
    salted.count()
    val aggs = collectPlan(salted.queryExecution.executedPlan)
      .count(_.isInstanceOf[HashAggregateExec])
    assert(aggs >= 3, s"expected two-phase agg, got $aggs HashAggregates")
  }
}
