package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (r9, extended r10): measures the claimed growth axis of
  * the iterative graph ops — per-round frontier sizes, round counts,
  * and wall time for BFS and cost-bounded SSSP — on (a) the fixture
  * graph across real scale factors and (b) a 1×/10× disjoint-replica
  * axis (VERDICT r9 #3: ten shifted copies of the sf0.1 fixture; the
  * frontier must scale 10× per round with IDENTICAL round count, and
  * wall time must stay round-dominated, the signature of work tracking
  * the frontier rather than the graph). PLANS.md records the output.
  * (`sbt "runMain graft.GraphProbe"`) */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runBoth(tag: String, docs: DataFrame, seeds: DataFrame): Unit = {
      val edges = queries.Graphs.fixtureEdges(docs)
      val bfsRounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val t0 = System.nanoTime()
      val hops = queries.Graphs.bfsHops(edges, seeds,
        roundProbe = Some((i, n) => bfsRounds += ((i, n))))
      val nBfs = hops.count()
      val tBfs = (System.nanoTime() - t0) / 1e9
      val ssspRounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      val t1 = System.nanoTime()
      val dist = queries.Graphs.ssspBounded(edges, seeds,
        (a, b) => pmod(a + b, lit(5L)) + lit(1L), maxCost = 30L,
        roundProbe = Some((i, n) => ssspRounds += ((i, n))))
      val nSssp = dist.count()
      val tSssp = (System.nanoTime() - t1) / 1e9
      def fmt(rs: Seq[(Int, Long)]) = rs.map { case (i, n) => s"$i:$n" }.mkString(" ")
      println(f"PROBE $tag docs=${docs.count()} seeds=${seeds.count()} " +
        f"bfs_reached=$nBfs bfs_rounds=${bfsRounds.size} bfs_frontier=[${fmt(bfsRounds.toSeq)}] bfs_s=$tBfs%.2f " +
        f"sssp_reached=$nSssp sssp_rounds=${ssspRounds.size} sssp_improved=[${fmt(ssspRounds.toSeq)}] sssp_s=$tSssp%.2f")
    }

    // real-SF sweep (the fixture graph tracks the documents table)
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf").select(col("doc_id"))
      val seeds = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id").as("id"))
      runBoth(sf, docs, seeds)
    }

    // disjoint-replica axis: k shifted copies of the sf0.1 id space.
    // The offset must clear the fixture's +2·10^6 node offsets AND be
    // ≡ 0 mod lcm(3, 10, 97) = 2910 (closure %3, sibling %10, seed
    // %97; 10 covers the %5 weights) so every replica is EXACTLY
    // isomorphic — then each round's frontier is exactly k× the base
    // with identical round count.
    val off = 2910L * 3437 // = 10,001,670 > 10^7
    val base = Tables.documents(spark, "/root/testdata/sf0.1").select(col("doc_id"))
    for (k <- Seq(1, 10)) {
      val rep = base.withColumn("_r", explode(sequence(lit(0), lit(k - 1))))
        .select((col("doc_id") + col("_r") * off).as("doc_id"))
      val seeds = rep.filter(col("doc_id") % off % 97 === 0)
        .select(col("doc_id").as("id"))
      runBoth(s"replica${k}x", rep, seeds)
    }

    // commonNeighbors growth probe (r10 s4): work driver is the wedge
    // count Σ deg·(deg−1)/2 — on disjoint isomorphic replicas it must
    // grow exactly k× (the engine axis; output/top-k is bounded).
    def runCn(tag: String, docs: DataFrame): Unit = {
      val edges = queries.Graphs.fixtureEdges(docs)
      val und = edges.select(col("a"), col("b"))
        .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        .distinct()
      val wedges = und.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .agg(sum(col("d") * (col("d") - 1) / 2).cast("long")).head().getLong(0)
      val t0 = System.nanoTime()
      val n = queries.Graphs.commonNeighbors(edges, maxDeg = 1000, k = 200).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"PROBE-CN $tag wedges=$wedges topk_rows=$n wall_s=$t%.2f")
    }
    for (k <- Seq(1, 10)) {
      val rep = base.withColumn("_r", explode(sequence(lit(0), lit(k - 1))))
        .select((col("doc_id") + col("_r") * off).as("doc_id"))
      runCn(s"replica${k}x", rep)
    }

    // LPA materialization cadence (r16, VERDICT r15 task 8): 19% of
    // the r15 bench headline was graph_label_prop, adjudicated as
    // per-round JOB-LAUNCH overhead at toy scale — so the falsifiable
    // form: time the declared 5-round LPA with a localCheckpoint every
    // round (cadence 1, the pre-r16 shape) vs every second round
    // (cadence 2, the new default). min-of-3 + warm-up each; identical
    // results by construction (checkpointing never changes values).
    {
      val docs = Tables.documents(spark, "/root/testdata/sf0.1").select(col("doc_id"))
      val (nodes, lEdges) = llm.Dedup.lpaFixture(docs)
      for (ce <- Seq(1, 2)) {
        def run(): Unit = {
          llm.Dedup.labelPropagation(nodes, lEdges, iters = 5, checkpointEvery = ce)
            .count(); ()
        }
        run() // warm-up
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE-LPA sf0.1 cadence=$ce min=${ts.min}%.2f s " +
          f"reps=[${ts.map(t => f"$t%.2f").mkString(" ")}]")
      }
    }
    spark.stop()
  }
}
