package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity time-series pipeline — the reference's semantic core
  * (forward-looking label + rolling features + threshold alerting),
  * re-expressed over the `events` test table:
  * `user_id` ↔ serial_number, `ts` ↔ date, `value` ↔ SMART raw counter,
  * `event_type = 'error'` ↔ failure indicator.
  *
  * Reference semantics reproduced exactly (SURVEY.md §2.6):
  *  - label = lead(indicator, 1) over per-entity date order
  *    (/root/reference/scripts/02_label_engineering.py:113-123)
  *  - rolling mean/std/max over ROW frames (-6..0), mean over (-13..0)
  *    (/root/reference/scripts/03_feature_engineering.py:96-120)
  *  - 1-step delta via lag (03_feature_engineering.py:128-132)
  *  - observation age via row_number (03_feature_engineering.py:140-143)
  *  - null fill 0 for warm-up rows (03_feature_engineering.py:146-154)
  *  - drop failure-day rows AFTER labeling (02_label_engineering.py:126-131)
  *  - alert = score >= threshold (06_deployment_code.py:137-140)
  *
  * Scale notes: one hash Exchange on user_id + one Sort feeds ALL window
  * expressions (same partition/order spec ⇒ Spark plans the differing
  * frames as stacked WindowExecs over one sorted child — no extra
  * shuffles). At 100 TB the only tuning knob is shuffle partition count /
  * AQE; no driver-side collection anywhere in the path.
  */
object Telemetry {
  val FailureType = "error"

  /** Event-id tiebreak makes per-user ordering total (duplicate µs
    * timestamps would otherwise make window results nondeterministic). */
  private val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
  private val w7 = byUser.rowsBetween(-6, 0)
  private val w14 = byUser.rowsBetween(-13, 0)

  /** Early projection + indicator derivation (reference P1/P2/P6:
    * prune columns before any shuffle). */
  def base(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("ts"), col("user_id"), col("value"),
      when(col("event_type") === FailureType, 1).otherwise(0).as("is_error"))

  /** W1: forward-looking label. Null lead (last row per user) → 0. */
  def labeled(events: DataFrame): DataFrame =
    base(events).withColumn(
      "failure_next",
      when(lead(col("is_error"), 1).over(byUser) === 1, 1).otherwise(0))

  /** W2-W6 + P7: rolling features, delta, observation age, null-fill.
    * Floats are rounded to 6 dp at derivation so every downstream
    * comparison (alerting threshold, oracle hash) sees identical values
    * regardless of partial-aggregation order.
    */
  def features(events: DataFrame): DataFrame =
    labeled(events).select(
      col("*"),
      round(avg(col("value")).over(w7), 6).as("value_mean_7"),
      round(coalesce(stddev(col("value")).over(w7), lit(0.0)), 6).as("value_std_7"),
      max(col("value")).over(w7).as("value_max_7"),
      round(avg(col("value")).over(w14), 6).as("value_mean_14"),
      round(coalesce(col("value") - lag(col("value"), 1).over(byUser), lit(0.0)), 6).as("value_delta_1"),
      row_number().over(byUser).as("obs_seq"))

  /** F1 + F5/P6: drop failure-day rows after labeling, then alert on the
    * rolling mean crossing the threshold. */
  def scored(events: DataFrame, tau: Double): DataFrame =
    features(events)
      .filter(col("is_error") === 0)
      .withColumn("alert", when(col("value_mean_7") >= tau, 1).otherwise(0))

  /** A2: alerts per day (two-level aggregate target). */
  def daily(scoredDf: DataFrame): DataFrame =
    scoredDf
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("alert")).cast("long").as("n_alerts"),
        sum(col("failure_next")).cast("long").as("n_failures"),
        round(avg(col("value_mean_7")), 6).as("avg_score"))
      .orderBy(col("day"))

  /** §4.3.1: the five separate count() jobs of
    * /root/reference/scripts/06_deployment_code.py:147-184 collapsed into
    * ONE aggregation pass (single scan, no re-scoring). */
  def confusion(scoredDf: DataFrame): DataFrame = {
    val cell = (a: Int, y: Int) =>
      sum(when(col("alert") === a && col("failure_next") === y, 1).otherwise(0)).cast("long")
    scoredDf.agg(
      cell(1, 1).as("tp"),
      cell(1, 0).as("fp"),
      cell(0, 1).as("fn"),
      cell(0, 0).as("tn"),
      count(lit(1)).as("n"))
      .withColumn("precision", round(col("tp").cast("double") / (col("tp") + col("fp")), 6))
      .withColumn("recall", round(col("tp").cast("double") / (col("tp") + col("fn")), 6))
  }

  // ---------------------------------------------------------------------
  // Shared oracle-SQL building blocks (DuckDB dialect = ANSI here).
  // Mirrors the Spark lineage above 1:1; kept adjacent so the two cannot
  // drift silently.
  // ---------------------------------------------------------------------

  val baseSql: String =
    s"""SELECT event_id, ts, user_id, value,
       |       CASE WHEN event_type = '$FailureType' THEN 1 ELSE 0 END AS is_error
       |FROM events""".stripMargin

  val windowClauseSql: String =
    """WINDOW
      |  wu  AS (PARTITION BY user_id ORDER BY ts, event_id),
      |  w7  AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  w14 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin

  val featuresSql: String =
    s"""WITH base AS ($baseSql),
       |feat AS (
       |  SELECT event_id, ts, user_id, value, is_error,
       |         CASE WHEN LEAD(is_error, 1) OVER wu = 1 THEN 1 ELSE 0 END AS failure_next,
       |         ROUND(AVG(value) OVER w7, 6) AS value_mean_7,
       |         ROUND(COALESCE(STDDEV_SAMP(value) OVER w7, 0), 6) AS value_std_7,
       |         MAX(value) OVER w7 AS value_max_7,
       |         ROUND(AVG(value) OVER w14, 6) AS value_mean_14,
       |         ROUND(COALESCE(value - LAG(value, 1) OVER wu, 0), 6) AS value_delta_1,
       |         ROW_NUMBER() OVER wu AS obs_seq
       |  FROM base
       |  $windowClauseSql
       |)""".stripMargin

  def scoredSql(tau: Double): String =
    s"""$featuresSql,
       |scored AS (
       |  SELECT *, CASE WHEN value_mean_7 >= $tau THEN 1 ELSE 0 END AS alert
       |  FROM feat WHERE is_error = 0
       |)""".stripMargin
}
