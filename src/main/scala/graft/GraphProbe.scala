package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (round 10): measures the claimed growth axis of the
  * iterative graph ops — per-round frontier sizes and round counts for
  * BFS and cost-bounded SSSP on the fixture graph — across real scale
  * factors. Per-round cost is frontier ⋈ adjacency, so the frontier
  * histogram IS the work profile; PLANS.md records the output.
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
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf").select(col("doc_id"))
      val nDocs = docs.count()
      val seeds = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id").as("id"))
      val edges = queries.Graphs.fixtureEdges(docs)
      val t0 = System.nanoTime()
      val hops = queries.Graphs.bfsHops(edges, seeds)
      val tBfs = (System.nanoTime() - t0) / 1e9
      val hist = hops.groupBy("hop").count().orderBy("hop").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      val t1 = System.nanoTime()
      val dist = queries.Graphs.ssspBounded(edges, seeds,
        (a, b) => pmod(a + b, lit(5L)) + lit(1L), maxCost = 30L)
      val tSssp = (System.nanoTime() - t1) / 1e9
      val nSssp = dist.count()
      val maxD = dist.agg(max(col("d"))).head().getLong(0)
      println(f"PROBE $sf docs=$nDocs seeds=${seeds.count()} " +
        f"bfs_reached=${hops.count()} bfs_rounds(hop:frontier)=[$hist] bfs_s=$tBfs%.2f " +
        f"sssp_reached=$nSssp sssp_maxcost=$maxD sssp_s=$tSssp%.2f")
    }
    spark.stop()
  }
}
