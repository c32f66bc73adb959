package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev harness (r21, VERDICT r20 task 4): hot-GRAM skew in the
  * substring-span detector, measured instead of guessed. Boilerplate
  * grams are natural heavy hitters at corpus scale; the pipeline's
  * exposure is the LEFT SEMI re-fetch keyed on gram_h (a hot gram's
  * occurrences land in one reduce partition) and the doc-keyed island
  * window after it.
  *
  * Fixture: the ×`m` salted corpus (cross-doc gram repeats ≈ 0) with
  * the declared query's own SpanHeader planted on doc_id % 3 — every
  * header gram then recurs in N/3 docs, the boilerplate pathology by
  * construction. With broadcast disabled (the at-scale regime) the
  * probe reports, per shuffle stage of the un-checkpointed span plan,
  * AQE's own skew inputs via [[PlanAudit.skewAdvice]]: hottest
  * partition bytes vs median, the detector thresholds, whether the
  * hot stage feeds a splittable SMJ input, and the resulting advice
  * ("none" / "aqe-handles" / "salt").
  *
  * `sbt "runMain graft.GramSkewProbe [sfDir] [m]"` — defaults
  * /root/testdata/sf0.1, 10. Results recorded in PLANS.md §r21 /
  * OPTIMIZATION_r21.md; the decision rule is guide §2.5 (salt only
  * when the runtime split will not fire AND the skew is material).
  */
object GramSkewProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Bench.lshFixtureScaled(spark, sfDir, m)
    try {
      val docs = Tables.documents(spark, dir)
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat(lit(Dedup.SpanHeader + " "), col("text")))
          .otherwise(col("text")).as("text"))
      val nDocs = planted.count()
      println(s"GRAMSKEW fixture m=$m docs=$nDocs header_docs=${nDocs / 3}")
      for (regime <- Seq("broadcast", "smj")) {
        if (regime == "smj") {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        }
        spark.sparkContext.setJobDescription(s"gramskew: spans @ $regime")
        val advice = PlanAudit.skewAdvice(Dedup.spanRowsPlan(planted))
        advice match {
          case Some(a) =>
            println(f"GRAMSKEW regime=$regime hot=${a.hotBytes}%d B med=${a.medianBytes}%.0f B " +
              f"factor=${a.skewFactor}%.1f threshold=${a.thresholdBytes}%d " +
              f"joinInput=${a.hotIsJoinInput} wouldSplit=${a.aqeWouldSplit} advice=${a.advice}")
          case None => println(s"GRAMSKEW regime=$regime no shuffle stages (all broadcast)")
        }
        spark.sparkContext.setJobDescription(null)
      }
    } finally {
      Bench.deleteRecursively(dir)
      spark.stop()
    }
  }
}
