package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-evidence dumper for the r21 REGIME KNOBS (the PlanDump
  * companion): writes `explain("formatted")` for both regimes of each
  * knob-bearing operator — the exact-dedup `dedupLayout` (agg |
  * window) and the familiarity `freqLayout` (join | window) — so the
  * non-default regime's plan shape is on the record beside the
  * declared one. `sbt "runMain graft.RegimeDump <outDir>"`. */
object RegimeDump {

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("plans/r21"))
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def dump(fileBase: String, label: String, df: DataFrame): Unit = {
      val body = s"== explain(formatted), $label, sf=$sfDir ==\n" +
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"$fileBase.txt"), body.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      println(s"[regimedump] wrote $fileBase.txt")
    }

    dump("exact_dedup_regime_agg", "exactDedupCorpus dedupLayout=agg (declared default)",
      llm.Curation.exactDedupCorpus(docs))
    dump("exact_dedup_regime_window", "exactDedupCorpus dedupLayout=window (at-scale)",
      llm.Curation.exactDedupCorpus(docs, dedupLayout = "window"))
    dump("familiarity_regime_join", "familiarityPlan freqLayout=join (declared default)",
      llm.TextAnalysis.familiarityPlan(docs))
    dump("familiarity_regime_window", "familiarityPlan freqLayout=window (non-broadcast)",
      llm.TextAnalysis.familiarityPlan(docs, freqLayout = "window"))
    spark.stop()
  }
}
