package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.pipeline.Telemetry

/** Backward as-of join — the canonical per-entity time-series operator
  * Spark's join family lacks (SURVEY §2.4: the reference avoids it via
  * window `lead`; this is the general form for joining a fact stream to
  * the latest-at-or-before row of a slowly-changing side).
  *
  * Implementation is the scale-correct union+window rewrite, not a
  * range join:
  *
  *   union(probe rows, build rows)
  *     → Window.partitionBy(key).orderBy(ts, side)   // build sorts first on ties
  *     → last(payload, ignoreNulls) over (-∞, 0]     // carry latest build value
  *     → filter(side = probe)
  *
  * Cost: ONE hash exchange on the key + one sort — identical to any
  * other window op — versus a range-predicate join that Spark would
  * plan as a broadcast-nested-loop (quadratic per key). Ties are
  * inclusive (`probe.ts >= build.ts`), matching DuckDB's ASOF JOIN,
  * which is exactly what the declared query is oracle-checked against.
  *
  * The native whole-operator alternative lives in
  * `graft.plans.AsOfJoinNative` (custom LogicalPlan + Strategy +
  * merge SparkPlan; `join_asof_native` runs the same oracle). Measured
  * trade at sf0.1 local[8]: this composed form is ~2× faster on narrow
  * schemas (whole-stage-codegen'd window vs the native operator's
  * row-at-a-time merge), they reach parity on wide schemas (the union
  * null-padding roughly doubles this form's shuffled bytes), and the
  * native form is strictly more robust to per-key skew: WindowExec
  * buffers each partition in an ExternalAppendOnlyUnsafeRowArray
  * (spills on hot keys) while the native merge holds O(1) state.
  * Default to this composed form; switch to the native operator for
  * wide payloads or skewed keys.
  */
object AsOfJoin {

  /** Left as-of-backward join. `right` must share `key` and `tsCol`
    * with `left`; its remaining columns are the carried payload
    * (null where no build row is at or before the probe row). */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == tsCol).toSeq
    val leftOnly = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val overlap = payload.toSet intersect leftOnly.toSet
    require(overlap.isEmpty,
      s"asofBackward requires disjoint non-key columns; shared: ${overlap.mkString(", ")} " +
        "(rename the right side's payload columns before joining)")
    val probe = payload.foldLeft(left.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val build = leftOnly.foldLeft(right.withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(probe.unionByName(build.select(probe.columns.map(col): _*))) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_side")
  }

  /** FORWARD as-of join — the look-ahead member of the family (each
    * probe row carries the EARLIEST build row at-or-after it; the
    * label-join direction, where an event looks forward to the summary
    * that will cover it). Same union+window rewrite and cost as
    * [[asofBackward]], mirrored: probe rows sort BEFORE build rows on
    * tie (so an equal-timestamp build row is in the forward frame —
    * inclusive, `probe.ts <= build.ts`) and the carried payload is
    * `first(_, ignoreNulls)` over [current, +∞). */
  def asofForward(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == tsCol).toSeq
    val leftOnly = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val overlap = payload.toSet intersect leftOnly.toSet
    require(overlap.isEmpty,
      s"asofForward requires disjoint non-key columns; shared: ${overlap.mkString(", ")} " +
        "(rename the right side's payload columns before joining)")
    val probe = payload.foldLeft(left.withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(right.schema(c).dataType))
    }
    val build = leftOnly.foldLeft(right.withColumn("_side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(probe.unionByName(build.select(probe.columns.map(col): _*))) {
      (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 0).drop("_side")
  }

  /** Shared probe/build inputs for the two declared as-of queries:
    * events as the probe stream, next-day-published per-user daily
    * means as the build side. One definition, two physical operators —
    * the queries cannot drift apart. */
  def asofInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val b = Telemetry.base(Tables.events(s, dir))
      .select("event_id", "ts", "user_id", "value")
    val pub = b.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg((round(avg(col("value")), 6) + lit(0.0)).as("prev_day_mean"))
      .select(col("user_id"),
        date_add(col("day"), 1).cast("timestamp").as("ts"),
        col("prev_day_mean"))
    (b, pub)
  }

  /** The one oracle both as-of queries are checked against: DuckDB's
    * native ASOF LEFT JOIN over the same inputs. */
  val asofOracleSql: String =
    s"""WITH b AS (${Telemetry.baseSql}),
       |d AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |         ROUND(AVG(value), 6) + 0 AS prev_day_mean
       |  FROM b GROUP BY 1, 2),
       |pub AS (
       |  SELECT user_id, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY AS ts, prev_day_mean
       |  FROM d)
       |SELECT b.event_id, b.ts, b.user_id, b.value, p.prev_day_mean
       |FROM b ASOF LEFT JOIN pub p
       |  ON b.user_id = p.user_id AND b.ts >= p.ts
       |ORDER BY b.event_id""".stripMargin

  val defs: Seq[Q] = Seq(
    // Each event matched to its user's most recent END-OF-DAY summary
    // (summaries "publish" at next-day 00:00, so day-1 events carry
    // null). Oracle: DuckDB's native ASOF LEFT JOIN — tie and null
    // semantics must agree exactly.
    Q("join_asof", asofOracleSql) { (s, dir) =>
      val (b, pub) = asofInputs(s, dir)
      asofBackward(b, pub, key = "user_id", tsCol = "ts")
        .orderBy("event_id")
    },

    // Same join, same oracle — but through the native whole-operator
    // path (graft.plans.AsOfJoinNative: custom LogicalPlan + Strategy +
    // merge-join SparkPlan). Two physical strategies, one semantics;
    // the driver hash-checks both against DuckDB's ASOF LEFT JOIN.
    Q("join_asof_native", asofOracleSql) { (s, dir) =>
      val (b, pub) = asofInputs(s, dir)
      graft.plans.AsOfJoinNative.asof(b, pub, key = "user_id", tsCol = "ts")
        .orderBy("event_id")
    },

    // FORWARD as-of: each event carries the next-published (at-or-
    // after) per-user daily mean — the summary that will COVER this
    // event, i.e. the label-join direction (backward as-of reads
    // history; forward as-of reads the future, which is exactly what
    // leakage audits need spelled out as its own operator). DuckDB's
    // native ASOF is backward-only, so the oracle replays the
    // union+window rewrite itself — probe before build on ties makes
    // the match inclusive (event.ts <= pub.ts).
    Q("join_asof_forward",
      s"""WITH base AS (${Telemetry.baseSql}),
         |b AS (SELECT event_id, ts, user_id, value FROM base),
         |d AS (
         |  SELECT user_id, CAST(ts AS DATE) AS day,
         |         ROUND(AVG(value), 6) + 0 AS m
         |  FROM base GROUP BY 1, 2),
         |pub AS (
         |  SELECT user_id, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY AS ts, m
         |  FROM d),
         |u AS (
         |  SELECT user_id, ts, event_id, value, CAST(NULL AS DOUBLE) AS upcoming_mean, 0 AS side
         |  FROM b
         |  UNION ALL
         |  SELECT user_id, ts, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), m, 1
         |  FROM pub),
         |w AS (
         |  SELECT user_id, ts, event_id, value, side,
         |    first_value(CASE WHEN side = 1 THEN upcoming_mean END IGNORE NULLS)
         |      OVER (PARTITION BY user_id ORDER BY ts, side
         |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS upcoming_mean
         |  FROM u)
         |SELECT event_id, ts, user_id, value, upcoming_mean
         |FROM w WHERE side = 0
         |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val (b, pub) = asofInputs(s, dir)
      asofForward(b, pub.withColumnRenamed("prev_day_mean", "upcoming_mean"),
        key = "user_id", tsCol = "ts")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          col("upcoming_mean"))
        .orderBy("event_id")
    },

    // TWO-SIDED nearest join — the as-of family's symmetric member
    // (sensor alignment, "closest error to each purchase"): each probe
    // row matches the build row with the smallest |Δt| in EITHER
    // direction, ties to the earlier (preceding) side. Same
    // union+window rewrite as asofBackward, run once per direction
    // over ONE exchange+sort: last(build, ignoreNulls) over (-∞,-1]
    // gives the nearest preceding build row, first(...) over [1,+∞)
    // the nearest following — then a scalar min picks the side. Cost:
    // one hash exchange on the key + one sort, vs the quadratic
    // per-key range join Spark would otherwise plan. Build rows sort
    // BEFORE probe rows at equal timestamps (side 0 < side 1), so a
    // same-instant build row is "preceding with gap 0" — the
    // deterministic tie rule both engines replay via ROWS frames.
    // All time arithmetic in exact integer µs.
    Q("join_nearest",
      """WITH s AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |         CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS side
        |  FROM events WHERE event_type IN ('error', 'purchase')),
        |w AS (
        |  SELECT user_id, us, event_id, side,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_id,
        |    last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_us,
        |    first_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_id,
        |    first_value(CASE WHEN side = 0 THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, side, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_us
        |  FROM s)
        |SELECT user_id, event_id AS purchase_id,
        |       CASE WHEN prev_us IS NOT NULL
        |                  AND (next_us IS NULL OR us - prev_us <= next_us - us)
        |            THEN prev_id ELSE next_id END AS error_id,
        |       CAST(CASE WHEN prev_us IS NOT NULL
        |                      AND (next_us IS NULL OR us - prev_us <= next_us - us)
        |                 THEN us - prev_us ELSE next_us - us END AS BIGINT) AS gap_us,
        |       CASE WHEN prev_us IS NOT NULL
        |                 AND (next_us IS NULL OR us - prev_us <= next_us - us)
        |            THEN 'before' ELSE 'after' END AS direction
        |FROM w
        |WHERE side = 1 AND (prev_us IS NOT NULL OR next_us IS NOT NULL)
        |ORDER BY user_id, purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("error", "purchase"))
        .select(
          col("user_id"),
          unix_micros(col("ts")).as("us"),
          col("event_id"),
          when(col("event_type") === "error", 0).otherwise(1).as("side"))
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("side"), col("event_id"))
      val back = order.rowsBetween(Window.unboundedPreceding, -1)
      val fwd = order.rowsBetween(1, Window.unboundedFollowing)
      val errId = when(col("side") === 0, col("event_id"))
      val errUs = when(col("side") === 0, col("us"))
      val w = ev
        .withColumn("prev_id", last(errId, ignoreNulls = true).over(back))
        .withColumn("prev_us", last(errUs, ignoreNulls = true).over(back))
        .withColumn("next_id", first(errId, ignoreNulls = true).over(fwd))
        .withColumn("next_us", first(errUs, ignoreNulls = true).over(fwd))
      val takePrev = col("prev_us").isNotNull &&
        (col("next_us").isNull || col("us") - col("prev_us") <= col("next_us") - col("us"))
      w.filter(col("side") === 1 &&
          (col("prev_us").isNotNull || col("next_us").isNotNull))
        .select(
          col("user_id"),
          col("event_id").as("purchase_id"),
          when(takePrev, col("prev_id")).otherwise(col("next_id")).as("error_id"),
          when(takePrev, col("us") - col("prev_us"))
            .otherwise(col("next_us") - col("us")).cast("long").as("gap_us"),
          when(takePrev, "before").otherwise("after").as("direction"))
        .orderBy(col("user_id"), col("purchase_id"))
    },
  )
}
