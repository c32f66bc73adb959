package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.pipeline.Telemetry

/** Skew-resistant rolling-window features: the two-phase/salting answer
  * for a HOT window key (VERDICT r1 flagged per-`user_id` skew as the
  * window pipeline's 100× risk — a single hot entity serializes one
  * partition under `Window.partitionBy(user_id)`).
  *
  * Exactly reproduces `Telemetry.features` (equality-tested on the full
  * sf0.01 frame in ChunkedWindowSpec) while bounding every physical
  * partition by TIME CHUNK, not by entity:
  *
  *   1. chunk rows by a fixed time grain (default 7 days);
  *   2. per-(user, chunk) row numbers + a tiny (user, chunk) → count
  *      table; a cumulative window over THAT table (cardinality
  *      |users|·|chunks|, not |rows|) yields each chunk's global start
  *      offset → every row knows its exact global per-user index
  *      without any whole-user partition;
  *   3. backward ROW frames of depth d need the previous d rows: each
  *      row ships a copy into every LATER chunk whose start offset is
  *      ≤ its index + d (at most d copies, typically 0–1) — the exact
  *      context, even across sparse chunks;
  *   4. one window per (user, chunk) over main+context rows computes
  *      the frames; context rows are dropped on emit.
  *
  * Cost: the single user-partitioned exchange becomes two
  * (user, chunk)-keyed exchanges plus a small-table join — and the
  * hottest partition shrinks from "all of one user's history" to "one
  * user-week (+ ≤6 context rows)". Forward-looking functions (`lead`)
  * are out of scope by design: labeling runs in the standard pipeline;
  * this handles the backward rolling-feature stage.
  */
object ChunkedWindow {

  /** Max backward depth across ALL frames: the 14-row mean
    * (rowsBetween(-13, 0)) dominates; lag(1) and the 7-row frames need
    * less. Context shipping must cover the deepest frame. */
  val FrameDepth = 13

  /** Drop-in replacement for the window stage of `Telemetry.features`:
    * input must be the labeled+filtered frame (event_id, ts, user_id,
    * value, is_error, failure_next); output schema and values are
    * identical to `Telemetry.features`. */
  def features(filtered: DataFrame, chunkMicros: Long = 7L * 86400L * 1000000L): DataFrame = {
    val d = FrameDepth
    val base = filtered.withColumn("_chunk", expr(s"unix_micros(ts) div $chunkMicros"))

    // intra-chunk position (one (user, chunk) exchange)
    val wuc = Window.partitionBy(col("user_id"), col("_chunk"))
      .orderBy(col("ts"), col("event_id"))
    val withRn = base.withColumn("_rn", row_number().over(wuc))

    // tiny per-(user, chunk) offsets table: cumulative count of prior
    // chunks = each chunk's global start index (0-based)
    val counts = withRn.groupBy(col("user_id"), col("_chunk"))
      .agg(count(lit(1)).as("_cnt"))
    val wu = Window.partitionBy(col("user_id")).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_cnt")).over(wu), lit(0L)))
      .select(col("user_id"), col("_chunk"), col("_off"))

    // exact global per-user index for every row
    val indexed = withRn
      .join(offsets, Seq("user_id", "_chunk"))
      .withColumn("_gidx", col("_off") + col("_rn") - 1)
      .drop("_rn", "_off")

    // ship context copies: row i reaches every later chunk starting at
    // offset ≤ i + d (≤ d copies per row)
    val dests = offsets
      .select(col("user_id").as("_du"), col("_chunk").as("_dchunk"), col("_off").as("_doff"))
    val context = indexed.join(dests,
        col("user_id") === col("_du") &&
          col("_dchunk") > col("_chunk") &&
          col("_doff") <= col("_gidx") + d)
      .drop("_du", "_chunk", "_doff")
      .withColumnRenamed("_dchunk", "_chunk")
      .withColumn("_ctx", lit(1))
    val combined = indexed.withColumn("_ctx", lit(0))
      .unionByName(context.select(indexed.columns.map(col) :+ col("_ctx"): _*))

    // the per-(user, chunk) window — hottest partition is one chunk + d rows
    val wf = Window.partitionBy(col("user_id"), col("_chunk")).orderBy(col("_gidx"))
    val w7 = wf.rowsBetween(-6, 0)
    val w14 = wf.rowsBetween(-13, 0)
    def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0)

    combined.select(
      col("*"),
      r6(avg(col("value")).over(w7)).as("value_mean_7"),
      r6(coalesce(stddev(col("value")).over(w7), lit(0.0))).as("value_std_7"),
      max(col("value")).over(w7).as("value_max_7"),
      r6(avg(col("value")).over(w14)).as("value_mean_14"),
      r6(coalesce(col("value") - lag(col("value"), 1).over(wf), lit(0.0))).as("value_delta_1"),
      (col("_gidx") + 1).as("obs_seq"))
      .filter(col("_ctx") === 0)
      // restore the single-window pipeline's exact column order
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("is_error"), col("failure_next"),
        col("value_mean_7"), col("value_std_7"), col("value_max_7"),
        col("value_mean_14"), col("value_delta_1"), col("obs_seq"))
  }

  /** Same oracle as `telemetry_features` — the physical layout differs,
    * the semantics must not. */
  val defs: Seq[Q] = Seq(
    Q("telemetry_features_chunked",
      s"${Telemetry.featSql} SELECT * FROM feat ORDER BY event_id") { (s, dir) =>
      features(Telemetry.filtered(Tables.events(s, dir))).orderBy("event_id")
    },
  )
}
