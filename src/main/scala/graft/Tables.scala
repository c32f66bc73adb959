package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Parquet is self-describing, so no `inferSchema` pass is ever needed
  * (the reference pays one on CSV: scripts/01_data_ingestion.py:17-22).
  * At 100 TB the rule is: schema comes from the data source or an explicit
  * `StructType` — never a sampling pass.
  */
object Tables {
  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val allTables: Seq[String] =
    starTables ++ Seq("events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: INT64 TIMESTAMP(NANOS) (which Spark's parquet reader
    * rejects without `nanosAsLong`, and then surfaces as a raw BIGINT of
    * nanos) and plain TIMESTAMP(MICROS) with isAdjustedToUTC=false (which
    * Spark reads as TIMESTAMP_NTZ). Normalize BOTH to a µs TimestampType
    * column by inspecting the loaded schema; the NTZ branch interprets
    * the stored wall-clock as UTC regardless of the caller's session
    * time zone (see [[normalizeTs]]), matching what DuckDB sees. The
    * conf is a runtime SQL conf, so this works under any caller session.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** ts → µs TimestampType regardless of the physical parquet encoding.
    *
    * The NTZ wall-clock is ALWAYS interpreted as UTC, independent of
    * `spark.sql.session.timeZone`: a bare `cast("timestamp")` would
    * re-anchor the wall-clock in the session zone and silently shift
    * every instant for a non-UTC caller (ADVICE r9). Under a non-UTC
    * session we cast then undo the session-zone anchoring with
    * `from_utc_timestamp(_, sessionTz)` — for any wall-clock outside a
    * DST transition gap of the session zone the round-trip is exact
    * (cast subtracts offset(tz), from_utc_timestamp adds it back),
    * recovering the UTC interpretation. Wall-clocks inside a DST gap
    * of the *session* zone (not of UTC, which has none) are the one
    * residual edge; TablesSpec pins the non-UTC-session identity. */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        val tz = raw.sparkSession.sessionState.conf.sessionLocalTimeZone
        if (tz == "UTC") raw.withColumn("ts", col("ts").cast("timestamp"))
        else raw.withColumn("ts",
          from_utc_timestamp(col("ts").cast("timestamp"), tz))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
