package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ChunkedWindow
import graft.pipeline.Telemetry

/** The skew-resistant chunked window must be EXACTLY the single-window
  * pipeline, row for row — that is the whole point: a physical-layout
  * change with zero semantic drift. */
class ChunkedWindowSpec extends SparkSpec {

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("event_id").collect().map(_.toString).toSeq

  private lazy val events = Tables.events(spark, sf("sf0.01"))
  private lazy val expected = canon(Telemetry.features(events))

  test("chunked features == single-window features on the full sf0.01 frame") {
    val got = canon(ChunkedWindow.features(Telemetry.filtered(events)))
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("equality holds under 1-day chunks (maximal context shipping)") {
    val got = canon(ChunkedWindow.features(
      Telemetry.filtered(events), chunkMicros = 86400L * 1000000L))
    assert(got === expected)
  }

  test("no full-data window partitions by user alone (skew stays defused)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = ChunkedWindow.features(Telemetry.filtered(events))
    df.count()
    val windows = collectPlan(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    for (w <- windows) {
      val partCols = w.partitionSpec.map(_.toString).mkString(",")
      val exprs = w.windowExpression.map(_.toString).mkString(",")
      // user-only windows allowed: the upstream labeling `lead` (input
      // stage, forward-looking — out of chunking scope by design) and
      // the cumulative-offset sum over the tiny (user, chunk) COUNTS
      // table. Every FRAME aggregate over full data must key on _chunk.
      if (partCols.contains("user_id") && !partCols.contains("_chunk")) {
        assert(exprs.contains("_cnt") || exprs.contains("lead("),
          s"full-data window partitioned by user alone: $exprs")
      }
    }
  }

  test("hottest partition is bounded by the chunk, not the user") {
    val filtered = Telemetry.filtered(events)
    val chunked = filtered
      .withColumn("_chunk", expr(s"unix_micros(ts) div ${86400L * 1000000L}"))
      .groupBy("user_id", "_chunk").count()
      .agg(max("count")).head().getLong(0)
    val whole = filtered.groupBy("user_id").count()
      .agg(max("count")).head().getLong(0)
    assert(chunked < whole, s"chunking did not reduce the max partition ($chunked vs $whole)")
  }
}
