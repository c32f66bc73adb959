package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ChunkedWindow
import graft.pipeline.Telemetry

/** Dev harness (VERDICT r12 task 2): the hot-key skew mitigation's
  * benefit, MEASURED instead of asserted. `Bench.skewFixture` plants a
  * user holding ~20% of events, but at bench scale (sf0.1 = 100k rows
  * → 20k hot rows) a single-task window sort is sub-second and the
  * chunked rewrite's extra exchanges dominate — the mitigation exists
  * for the partition that does NOT fit one task. This probe grows the
  * hot user's HISTORY alone: replica k of the HOT ROWS ONLY shifts
  * their timestamps by k·(span + 1 day) and event_ids by k·10⁹, so
  *  - the hot user's single `Window.partitionBy(user_id)` partition
  *    grows m-fold and converges to the plain plan's critical path
  *    (the pathology axis — one entity outgrowing everyone else),
  *  - everyone else's work stays constant, and
  *  - per-(user, week) chunk sizes stay CONSTANT by construction —
  *    the chunked plan's hottest task is scale-invariant.
  * Reported per scale: rows, hot-user rows, min-of-k wall time of the
  * plain window pipeline vs `ChunkedWindow.features`, and the ratio.
  * The crossover scale (where chunked starts winning) is the number
  * PLANS.md records; above it the plain plan's hot task grows
  * linearly while chunked stays flat.
  *
  * `sbt "runMain graft.SkewProbe [sfDir] [scales] [reps]"` — scales is
  * a comma list of replication factors (the CdcProbe convention).
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(10, 30))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // The fixture recipe is Bench's (one definition — the bench's
    // published skew block and this table must measure the same
    // fixture): hot-user re-key + hot-rows-ONLY replication. Whole-
    // table replication (first draft) buried the hot task's
    // serialization under m× more well-distributed work (measured:
    // 0.6× at m=100); replicating only the hot history makes the
    // plain plan's critical path converge to the single hot-partition
    // sort while chunked's hottest task stays one user-week.
    def fixture(m: Int): String = Bench.skewAmplifiedFixture(spark, sfDir, m)

    // Bench.forceFeatures: .count() would let ColumnPruning DROP the
    // Window operators and time a bare scan (see its scaladoc)
    def timeMin(df: => DataFrame): Double = {
      Bench.forceFeatures(df) // warm-up: codegen + scan cache
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); Bench.forceFeatures(df)
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    println(f"${"m"}%4s ${"rows"}%10s ${"hot_rows"}%10s ${"plain_s"}%9s ${"chunked_s"}%9s ${"plain/chunked"}%13s")
    for (m <- 1 +: scales) {
      val dir = fixture(m)
      try {
        val ev = Tables.events(spark, dir)
        val rows = ev.count()
        val hot = ev.filter(col("user_id") === -1L).count()
        val plain = timeMin(Telemetry.features(Tables.events(spark, dir)))
        val chunked = timeMin(
          ChunkedWindow.features(Telemetry.filtered(Tables.events(spark, dir))))
        println(f"$m%4d $rows%10d $hot%10d $plain%9.3f $chunked%9.3f ${plain / chunked}%13.2f")
      } finally Bench.deleteRecursively(dir) // a crashed rep must not leak the fixture
    }
    spark.stop()
  }
}
