package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (r13): the headline queries' MEASURED shuffle volume —
  * bytes written to shuffle, shuffle records, broadcast bytes — from
  * the executed plans' SQLMetrics via `PlanAudit.shuffleStats`.
  *
  * Exchange COUNTS (PlanAudit/PlanAuditSpec) bound how many barriers a
  * plan pays; this probe measures what each barrier MOVES, which is
  * the cost driver at 100 TB: a query whose shuffle bytes are a small
  * multiple of its input provably ships keys/ids, not payloads, and
  * its absolute cost extrapolates linearly with data; one that
  * shuffles a large multiple of its input is re-materializing payload
  * columns through an exchange and will bottleneck on the wire first.
  * PLANS.md records bytes-per-input-row at two SFs — scale-stable
  * per-row footprints are the pass criterion.
  *
  * `sbt "runMain graft.ShuffleProbe [sfDir] [query ...]"` — defaults
  * to the Bench headline set on the raw corpus (fixture queries run on
  * Bench's planted LSH fixture, matching what Bench times).
  */
object ShuffleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Set[String] = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val run = SparkEntry.all
      .filter(q => SparkEntry.headline.contains(q.name))
      .filter(q => only.isEmpty || only(q.name))
    val fixtureDir =
      if (run.exists(q => Bench.fixtureQueries.contains(q.name)))
        Some(Bench.lshFixture(spark, sfDir))
      else None

    println(f"${"query"}%-26s ${"shuffle_MB"}%11s ${"shuffle_rows"}%13s ${"bcast_MB"}%9s")
    for (q <- run) {
      val dir =
        if (Bench.fixtureQueries.contains(q.name)) fixtureDir.getOrElse(sfDir)
        else sfDir
      try {
        val (sb, sr, bb) = PlanAudit.shuffleStats(q.run(spark, dir))
        println(f"${q.name}%-26s ${sb / 1048576.0}%11.2f $sr%13d ${bb / 1048576.0}%9.2f")
      } catch {
        case e: Throwable =>
          println(s"${q.name} FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    fixtureDir.foreach(Bench.deleteRecursively)
    spark.stop()
  }
}
