package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Gap-based sessionization — the canonical per-entity segmentation op
  * for telemetry/clickstream (the batch analog of Structured
  * Streaming's session windows; the streaming state variant lives in
  * `graft.streaming.StreamingAlerts`).
  *
  * Shape: ONE hash exchange on `user_id` + one sort serves both the
  * gap detection (`lag`) and the running session counter (cumulative
  * `sum` over the same window spec) — Catalyst fuses the two window
  * expressions into a single Window operator, so sessionizing costs
  * exactly what any rolling feature costs. Per-session rollup then
  * re-uses the same partitioning (groupBy on user_id, session_id is a
  * narrower key of the same exchange — no second wide shuffle).
  */
object Sessionize {

  /** Assign 1-based session ids per user: a new session starts when
    * the gap to the previous event exceeds `gapSeconds`. */
  def withSessionIds(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs: Column = lag(col("ts"), 1).over(byUser)
    val newSession = when(
      prevTs.isNull ||
        (unix_micros(col("ts")) - unix_micros(prevTs)) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  val defs: Seq[Q] = Seq(
    // Per-session rollup with a 30-minute gap rule: id assignment is
    // windowed, the rollup re-uses the user_id exchange.
    Q("sessionize_rollup",
      """WITH e AS (SELECT event_id, ts, user_id, value FROM events),
        |s AS (
        |  SELECT *,
        |         CAST(SUM(CASE WHEN prev_ts IS NULL
        |                         OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000 THEN 1
        |                       ELSE 0 END)
        |                OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |             AS BIGINT) AS session_id
        |  FROM (SELECT *, LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM e))
        |SELECT user_id, session_id,
        |       COUNT(*) AS n_events,
        |       MIN(ts) AS session_start,
        |       MAX(ts) AS session_end,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS session_value
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select("event_id", "ts", "user_id", "value")
      withSessionIds(e, gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          // decimal-sum convention: order-independent addition, DOUBLE on
          // the wire (see queries/Relational.dsum)
          sum(col("value").cast("decimal(30,6)")).cast("double").as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
  )
}
