package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness (r20, VERDICT r19 task 3): the reliable-checkpoint
  * COST CURVE — wall time of the LPA and BFS fixtures at sf0.1 under
  * the three lineage policies (localCheckpoint / reliable k=1 /
  * reliable k=3 via `graft.iter.reliableEveryK`), plus the bytes each
  * policy writes to the checkpoint filesystem. Local fs stands in for
  * HDFS/object storage: the WRITE VOLUME column is the
  * deployment-portable number (the wall-time delta scales with the
  * store's write throughput), which is why both are printed. PLANS.md
  * records the output as the cadence knob's shipping guidance.
  * (`sbt "runMain graft.IterCkptProbe"`) */
object IterCkptProbe {
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
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val (nodes, edges) = llm.Dedup.lpaFixture(docs)
    // a 12-hop chain over the doc id space: the BFS fixture's round
    // count is the chain length, so the per-round checkpoint cost
    // shows up 12×
    val chain = (0 until 12).map { k =>
      docs.select((col("doc_id") * 16 + k).as("a"), (col("doc_id") * 16 + k + 1).as("b"))
    }.reduce(_ unionByName _)
    val seeds = docs.select((col("doc_id") * 16).as("id"))

    def dirBytes(d: java.io.File): Long =
      Option(d.listFiles()).toSeq.flatten
        .map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum

    def run(tag: String, policy: Option[(String, Int)])(body: => Long): Unit = {
      val ckpt = policy.map { case (_, _) =>
        java.nio.file.Files.createTempDirectory("graft_ickpt_probe").toString
      }
      policy.foreach { case (_, k) =>
        spark.conf.set(IterCkpt.ConfKey, ckpt.get)
        spark.conf.set(IterCkpt.EveryKConfKey, k.toString)
      }
      try {
        body // warm
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = body
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val written = ckpt.map(c => dirBytes(new java.io.File(c))).getOrElse(0L)
        println(f"PROBE $tag%-16s min=${ts.map(_._1).min}%.3f s rows=${ts.head._2} ckpt_bytes=$written")
      } finally {
        spark.conf.unset(IterCkpt.ConfKey)
        spark.conf.unset(IterCkpt.EveryKConfKey)
        ckpt.foreach(Bench.deleteRecursively)
      }
    }

    println(s"PROBE nodes=${nodes.count()} edges=${edges.count()} chain=${chain.count()}")
    for ((tag, pol) <- Seq(
        ("local", None),
        ("reliable_k1", Some(("r", 1))),
        ("reliable_k3", Some(("r", 3))))) {
      run(s"lpa_$tag", pol)(llm.Dedup.labelPropagation(nodes, edges, iters = 5).count())
      run(s"bfs_$tag", pol)(queries.Graphs.bfsHops(chain, seeds, maxIter = 12).count())
    }
    spark.stop()
  }
}
