package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r19, VERDICT r18 task 7): measures the LPA round's
  * plan shape and wall time under the fused `label_mode` aggregation +
  * src-pre-partitioned edge layout, against the sf0.1 declared
  * fixture at the bench's thread count. Prints per-variant min-of-3
  * wall times and the single-round executed plan's exchange count.
  * PLANS.md records the output. (`sbt "runMain graft.LpaLayoutProbe"`) */
object LpaLayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    val (nodes, edges) = llm.Dedup.lpaFixture(docs)
    println(s"PROBE nodes=${nodes.count()} edges=${edges.count()}")
    // warm the JVM/codegen like the bench's interleaved passes do
    llm.Dedup.labelPropagation(nodes, edges, iters = 5).count()
    def time(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROBE $tag%-10s min=${ts.map(_._1).min}%.3f s rows=${ts.head._2}")
    }
    // the r18 shape, replicated inline for the same-JVM A/B: und
    // localCheckpoint (no layout), two-step count -> max_by argmax
    def lpaOld(iters: Int): Long = {
      val und = edges.select(col("a"), col("b"))
        .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint()
      var labels = nodes.select(col("id"), col("id").as("label"))
      for (_ <- 1 to iters) {
        val counts = und
          .join(labels.select(col("id").as("b"), col("label")), "b")
          .groupBy(col("a"), col("label")).agg(count(lit(1)).as("c"))
        val winners = counts.groupBy(col("a")).agg(
          max_by(col("label"), struct(col("c"), (-col("label")).as("nl"))).as("label"))
        labels = nodes.select(col("id"))
          .join(winners.withColumnRenamed("a", "id"), Seq("id"), "left")
          .select(col("id"), coalesce(col("label"), col("id")).as("label"))
          .localCheckpoint()
      }
      labels.count()
    }
    lpaOld(5) // warm the old shape's codegen too
    time("old")(lpaOld(5))
    time("fused")(llm.Dedup.labelPropagation(nodes, edges, iters = 5).count())
    time("old2")(lpaOld(5))
    time("fused2")(llm.Dedup.labelPropagation(nodes, edges, iters = 5).count())
    // single-round executed plan UNDER THE REAL LAYOUT: pre-partitioned
    // persisted edges, one fused round
    // the SHARED derivation, not an inline copy — the census must
    // measure exactly the edge frame labelPropagation builds
    val undP = llm.Dedup.undirectedEdges(edges)
      .repartition(col("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    undP.count()
    val nodesP = nodes.select(col("id")).repartition(col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    nodesP.count()
    val labels0 = nodesP.select(col("id"), col("id").as("label")).localCheckpoint()
    val winners = undP
      .join(labels0.select(col("id").as("b"), col("label")), "b")
      .groupBy(col("a"))
      .agg(graft.functions.label_mode(col("label")).as("label"))
    val round = nodesP
      .join(winners.withColumnRenamed("a", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    // PlanAudit owns the AQE-aware walk (review r19 — the inline copy
    // here skipped subqueries and duplicated ~20 lines)
    val (nEx, nBc) = PlanAudit.exchangeCounts(round)
    println(s"PROBE round_plan shuffle_exchanges=$nEx broadcast_exchanges=$nBc")
    println(round.queryExecution.executedPlan.toString.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate")).mkString("\n"))
    // r20 (VERDICT r19 task 2): the NON-BROADCAST regime census. Force
    // the SMJ plan (labels never broadcast — the >10⁸-node regime) and
    // measure one un-checkpointed round under BOTH edge layouts plus
    // the timed 5-round loop under the edgeLayoutKey knob. Expected
    // (pinned in LlmSpec): hash(b) layout → 2 shuffles (the edge-sized
    // label_mode re-key by a — irreducible — plus the node-sized labels
    // re-key to b, unavoidable because checkpoint truncation reads back
    // as UnknownPartitioning under AQE); hash(a) layout → 3 (the SMJ
    // additionally re-keys the EDGES by b every round).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for (key <- Seq("a", "b")) {
      val undK = llm.Dedup.undirectedEdges(edges)
        .repartition(col(key))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      undK.count()
      val roundK = llm.Dedup.lpaRound(undK, nodesP, labels0)
      val (kEx, kBc) = PlanAudit.exchangeCounts(roundK)
      val (kBytes, kRecs, _) = PlanAudit.shuffleStats(roundK)
      println(s"PROBE smj_round layout=hash($key) shuffle_exchanges=$kEx " +
        s"broadcast_exchanges=$kBc shuffled_bytes=$kBytes shuffled_recs=$kRecs")
      println(roundK.queryExecution.executedPlan.toString.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Aggregate") ||
          l.contains("Scan") || l.contains("Sort")).mkString("\n"))
      undK.unpersist()
    }
    time("smj_a")(llm.Dedup.labelPropagation(nodes, edges, iters = 5).count())
    time("smj_b")(llm.Dedup.labelPropagation(
      nodes, edges, iters = 5, edgeLayoutKey = "b").count())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")

    // disjoint-replica axis (the GraphProbe discipline): k shifted
    // copies of the fixture graph — LPA's work must scale ~k× per
    // round with identical round count and an unchanged plan shape
    val off = 10000000L // clears the fixture's +5·10⁶ node offsets
    def rep(df: org.apache.spark.sql.DataFrame, cols: Seq[String], k: Int) =
      df.withColumn("_r", explode(sequence(lit(0), lit(k - 1))))
        .select(cols.map(c => (col(c) + col("_r") * off).as(c)): _*)
    for (k <- Seq(1, 10)) {
      val n = rep(nodes, Seq("id"), k)
      val e = rep(edges, Seq("a", "b"), k)
      val t0 = System.nanoTime()
      val out = llm.Dedup.labelPropagation(n, e, iters = 5).count()
      println(f"PROBE replica${k}x labels=$out t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
