package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Bucketized interval (range) join — point-in-interval matching
  * without a range-predicate join, which Spark can only plan as a
  * broadcast-nested-loop (quadratic blowup once neither side
  * broadcasts).
  *
  * Rewrite: pick a bucket width B; explode each interval to the
  * epoch-buckets it covers (`sequence(floor(start/B),
  * floor((end-1)/B))` — interval length bounds the fan-out); a point
  * lives in exactly one bucket, so an equi-join on the bucket followed
  * by the exact `start <= ts < end` filter finds every match exactly
  * once (no dedup step needed — the point's single bucket is the only
  * place a covering interval can meet it). Shuffle is |points| +
  * |intervals| × ceil(len/B) rows on a uniform key — the standard
  * engine lowering (DuckDB/Trino plan IEJoin/range partitioning the
  * same way; Spark just needs it spelled out).
  */
object RangeJoin {

  /** Equi-bucket lowering of `point.tsCol ∈ [iv.startCol, iv.endCol)`.
    * `bucketMicros` should be on the order of the typical interval
    * length: too small inflates interval replication, too large packs
    * many points per bucket (both correct, only cost differs). */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketMicros: Long): DataFrame = {
    val pB = points.withColumn("_bucket",
      floor(unix_micros(col(tsCol)) / bucketMicros))
    // empty/inverted intervals match nothing — and must be dropped
    // BEFORE the explode: sequence() counts DOWN when start > stop, so
    // one swapped-endpoint row would otherwise fan out to every bucket
    // between the two timestamps
    val ivB = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket",
        explode(sequence(
          floor(unix_micros(col(startCol)) / bucketMicros),
          floor((unix_micros(col(endCol)) - 1) / bucketMicros))))
    pB.join(ivB, "_bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bucket")
  }

  val defs: Seq[Q] = Seq(
    // Unaligned half-open daily windows (03:00–17:30) over the events
    // stream; the oracle states the range predicate directly — DuckDB
    // plans it natively, our side goes through the bucket lowering.
    // 12 h buckets: each 14.5 h interval explodes to 2–3 buckets.
    Q("join_range_bucketed",
      """WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |iv AS (SELECT day,
        |              CAST(day AS TIMESTAMP) + INTERVAL 3 HOUR AS start_ts,
        |              CAST(day AS TIMESTAMP) + INTERVAL 17 HOUR + INTERVAL 30 MINUTE AS end_ts
        |       FROM d)
        |SELECT iv.day, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS window_value
        |FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        |GROUP BY iv.day
        |ORDER BY iv.day""".stripMargin) { (s, dir) =>
      val e = Tables.events(s, dir).select(col("ts"), col("value"))
      val iv = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day")).distinct()
        .select(col("day"),
          (col("day").cast("timestamp") + expr("INTERVAL 3 HOUR")).as("start_ts"),
          (col("day").cast("timestamp") + expr("INTERVAL 17 HOUR 30 MINUTE")).as("end_ts"))
      pointInInterval(e, iv, "ts", "start_ts", "end_ts",
        bucketMicros = 12L * 3600 * 1000000)
        .groupBy(col("day"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(30,6)")).cast("double").as("window_value"))
        .orderBy(col("day"))
    },
  )
}
