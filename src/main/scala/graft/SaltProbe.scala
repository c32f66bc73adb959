package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Salted

/** Dev harness (r13): the salted-join mitigation's benefit, measured —
  * the join-side sibling of SkewProbe's window crossover. `Salted.
  * joinSalted`'s scaladoc claims a hot join key's reducer ceiling
  * drops |hottest| → |hottest|/salts at |dim|·salts replication cost;
  * this probe plants the hot key and times it instead of asserting.
  *
  * Fixture (in-memory `spark.range`, deterministic): `n` fact rows of
  * which 1-in-`hotEvery` share ONE join key (the hot entity) and the
  * rest spread uniformly over `dimN` keys; a `dimN`-row dim side with
  * a payload column; optional `payloadW`-byte fact payload (wide rows
  * are what make a hot reducer's buffered volume real). Broadcast is
  * disabled (threshold −1) — the salt pattern exists precisely for
  * the not-broadcastable case.
  *
  * Three configurations, min-of-`reps` each:
  *   - plain shuffle join, AQE skew-join OFF — the naive baseline one
  *     hot reducer serializes;
  *   - plain shuffle join, AQE skew-join ON — what Spark's runtime
  *     mitigation buys when it fires;
  *   - `joinSalted(salts)` with AQE skew-join OFF — the manual
  *     pattern for plans AQE cannot split.
  *
  * Measured (PLANS.md r13 table): salting's benefit tracks how much
  * of the wall the hot reducer owns — negligible on narrow rows
  * (shuffle write dominates), 1.6× at 20% hot / 200 B rows, 2.75× at
  * 50% hot — and on THIS shape (shuffle join + post-join aggregate)
  * AQE's skew-join never fired (1.0× at every point), which is the
  * documented reason the manual pattern exists.
  *
  * `sbt "runMain graft.SaltProbe [nRows] [dimN] [salts] [reps]
  * [payloadW] [hotEvery]"`.
  */
object SaltProbe {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    val dimN = args.lift(1).map(_.toLong).getOrElse(200000L)
    val salts = args.lift(2).map(_.toInt).getOrElse(8)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    // fact-side payload width (bytes): at 100 TB rows are WIDE — a hot
    // reducer's problem is the VOLUME it must buffer/sort/spill, and a
    // 16-byte synthetic row understates it (measured: 1.14× at 64M
    // narrow rows because the all-rows shuffle write dominates). Width
    // also pushes the hot partition past AQE's 256 MB skew threshold,
    // so the AQE-on row shows the runtime mitigation actually firing.
    val payloadW = args.lift(4).map(_.toInt).getOrElse(0)
    // 1-in-hotEvery rows land on the hot key (5 → 20%, 2 → 50%)
    val hotEvery = args.lift(5).map(_.toLong).getOrElse(5L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1-in-hotEvery fact rows on key 0; remainder uniform over [1, dimN)
    def factOf(s: SparkSession): DataFrame = {
      val base = s.range(0, n, 1, 32).select(
        when(pmod(col("id"), lit(hotEvery)) === 0, lit(0L))
          .otherwise(pmod(hash(col("id")), lit(dimN - 1)) + 1).as("k"),
        col("id").as("v"))
      if (payloadW <= 0) base
      else base.withColumn("fpay", rpad(hex(col("v")), payloadW, "x"))
    }
    def fact: DataFrame = factOf(spark)
    def dimOf(s: SparkSession): DataFrame = s.range(0, dimN, 1, 8).select(
      col("id").as("dk"), (col("id") * 37 % 1000).as("payload"))
    def dim: DataFrame = dimOf(spark)

    // the consumer aggregates across the join output, so the join
    // executes in full; touching v, payload, and the wide column
    // defeats column pruning of every input
    def consume(j: DataFrame): Unit = {
      val wide = if (payloadW > 0) length(col("fpay")) else lit(0)
      j.agg(sum(col("v") + col("payload") + wide)).head(); ()
    }

    def timeMin(build: () => DataFrame): Double = {
      consume(build()) // warm-up
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); consume(build()); (System.nanoTime() - t0) / 1e9
      }.min
    }

    def withConf[A](skewJoin: Boolean)(body: => A): A = {
      val conf = spark.conf
      val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
      val savedSkew = conf.get("spark.sql.adaptive.skewJoin.enabled")
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
        body
      } finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", savedSkew)
      }
    }

    val hotRows = fact.filter(col("k") === 0L).count()
    println(s"n=$n dimN=$dimN hot_rows=$hotRows salts=$salts reps=$reps cpus=$cpus")

    val plainOff = withConf(skewJoin = false) {
      timeMin(() => fact.join(dim, col("k") === col("dk")))
    }
    val plainAqe = withConf(skewJoin = true) {
      timeMin(() => fact.join(dim, col("k") === col("dk")))
    }
    val salted = withConf(skewJoin = false) {
      timeMin(() => Salted.joinSalted(fact, dim, "k", "dk",
        saltSource = Seq("v"), salts = salts))
    }
    println(f"${"config"}%-22s ${"sec"}%8s")
    println(f"${"plain (AQE skew off)"}%-22s $plainOff%8.3f")
    println(f"${"plain (AQE skew on)"}%-22s $plainAqe%8.3f")
    println(f"${s"salted x$salts (AQE off)"}%-22s $salted%8.3f")
    println(f"speedup salted vs naive: ${plainOff / salted}%.2f  |  AQE vs naive: ${plainOff / plainAqe}%.2f")

    // ---- AQE compressed-bytes blind-spot readout (VERDICT r13 task 5)
    // The skew detector thresholds on COMPRESSED map-output bytes
    // (spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes,
    // 256 MB default, AND 5× the median partition); the reducer pays
    // the DECOMPRESSED volume. Read the same planted-hot shuffle's
    // per-partition map stats twice — compressed on the live context,
    // then identically with shuffle compression disabled on a fresh
    // context — and the ratio is the blind factor: AQE sees H/ratio
    // where the reducer buffers H, so the detector stays silent until
    // the TRUE hot-partition volume exceeds ratio × threshold.
    def hotStats(s: SparkSession): (Double, Double) = {
      val conf = s.conf
      val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
      val savedSkew = conf.get("spark.sql.adaptive.skewJoin.enabled")
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        // consumer must mirror the timed runs': with payloadW > 0 the
        // timed join ships fpay through the shuffle, so the readout must
        // too — a sum over (v, payload) alone lets column pruning drop
        // the wide column and the "blind factor" would reflect bare
        // longs, not the compressible rows the probe is about (ADVICE r14)
        val wide = if (payloadW > 0) length(col("fpay")) else lit(0)
        val stages = PlanAudit.shufflePartitionBytes(
          factOf(s).join(dimOf(s), col("k") === col("dk"))
            .select(sum(col("v") + col("payload") + wide).as("s")))
        if (stages.isEmpty) {
          // AQE disabled (user conf/env) → no ShuffleQueryStageExec to
          // read; report instead of throwing away the timed results
          println("AQE-VIEW unavailable: no AQE query stages found " +
            "(is spark.sql.adaptive.enabled off?)")
          (0.0, 0.0)
        } else {
          // the fact-side stage owns the global max partition (the hot key);
          // Bench.stat's true median — a(n/2) on the always-even partition
          // count is the upper-middle bias ADVICE r7 fixed
          val hot = stages.map(a => if (a.isEmpty) 0L else a.max).max
          val med = Bench.stat(
            stages.maxBy(a => if (a.isEmpty) 0L else a.max).sorted.map(_.toDouble).toSeq)._2
          (hot / 1048576.0, med / 1048576.0)
        }
      } finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
        conf.set("spark.sql.adaptive.skewJoin.enabled", savedSkew)
      }
    }
    val (hotC, medC) = hotStats(spark)
    spark.stop()
    val sparkU = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    sparkU.sparkContext.setLogLevel("ERROR")
    val (hotU, medU) = hotStats(sparkU)
    val ratio = if (hotC > 0) hotU / hotC else Double.NaN
    println(f"AQE-VIEW hot_partition compressed=$hotC%.1f MB  uncompressed=$hotU%.1f MB  " +
      f"ratio=$ratio%.2f  (median partition: $medC%.2f / $medU%.2f MB)")
    println(f"AQE blind while true hot-partition volume < ${ratio * 256}%.0f MB " +
      f"(ratio x 256 MB default threshold; detector also needs hot > 5 x median)")
    sparkU.stop()
  }
}
