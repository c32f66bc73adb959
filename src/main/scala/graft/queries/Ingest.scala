package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Ingestion surface (SURVEY.md §2.1): CSV with explicit schema
  * (S1 — the reference's front door, /root/reference/scripts/
  * 01_data_ingestion.py:17-22, minus the inferSchema extra pass) and
  * the tuned parquet sink (S3/S4 — 64 MB row groups / 8 MB pages /
  * snappy, /root/reference/scripts/02_label_engineering.py:156-174).
  *
  * Each query is a write→read round-trip whose final aggregate is
  * oracle-checked against the ORIGINAL parquet table — so the check
  * proves the sink+scan pair is lossless, not just that the scan ran.
  * Scratch output goes under java.io.tmpdir (harness-local, never the
  * data path; at scale sinks write to the job's output location).
  */
object Ingest {

  /** Per-JVM unique scratch root: two concurrent driver processes
    * (parallel suites, two Verify runs) must never write-then-read the
    * same sink path (the round-6 IVF race, fixed for every scratch
    * writer). */
  private val session: String = {
    val s = java.util.UUID.randomUUID().toString.take(8)
    // scratch dies with the JVM (ADVICE r7 / VERDICT r9 #8 — the
    // lshFixture shutdown-hook discipline, applied to every writer)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.Bench.deleteRecursively(
        Paths.get(sys.props("java.io.tmpdir"), "graft_qtmp", s"ingest_$s").toString)))
    s
  }
  private def tmp(name: String): String =
    Paths.get(sys.props("java.io.tmpdir"), "graft_qtmp", s"ingest_$session", name).toString

  /** Explicit schema for the CSV round-trip subset — schema comes from
    * the engine, never from a sampling pass (SURVEY §1.6). */
  val ordersCsvSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", DateType)))

  /** Small-file compaction (round 9): rewrite a fragmented parquet
    * directory into ~`targetBytes` outputs — the table-maintenance
    * pass every long-lived 100 TB dataset needs (streaming sinks,
    * incremental ingests, and per-task writers shred tables into
    * thousands of KB-scale files; scan cost then goes to task
    * scheduling and footer reads, not data). Output file count =
    * ceil(input bytes ÷ target) from the ACTUAL file listing (no
    * guessed row widths); the rewrite is one round-robin repartition —
    * no key shuffle semantics, content byte-identical. Returns the
    * output partition count. */
  def compactParquet(
      spark: SparkSession, inDir: String, outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compactParquet: targetBytes must be > 0")
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nOut = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    nOut
  }

  val defs: Seq[Q] = Seq(

    // Small-file compaction round-trip: the documents table is first
    // SHREDDED into 64 fragment files (the streaming-sink pathology),
    // compacted by the byte-target rewrite, and the compacted scan's
    // per-lang aggregate is oracle-checked against the ORIGINAL table
    // — proving the maintenance pass is lossless. File-count shrink
    // is pinned in OperatorsSpec (bytes are codec-dependent, so the
    // count stays out of the oracle).
    Q("parquet_compact_roundtrip",
      """SELECT lang,
        |       COUNT(*) AS n,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       CAST(SUM(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin) { (s, dir) =>
      val frag = tmp("docs_fragmented")
      val compacted = tmp("docs_compacted")
      Tables.documents(s, dir).repartition(64)
        .write.mode(SaveMode.Overwrite).parquet(frag)
      compactParquet(s, frag, compacted, targetBytes = 64L * 1024 * 1024)
      s.read.parquet(compacted)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(col("doc_id")).cast("long").as("id_sum"))
        .orderBy(col("lang"))
    },

    // S1 + S3: parquet → CSV (header) → typed CSV scan → aggregate.
    Q("csv_roundtrip_agg",
      """SELECT o_orderstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
        |       MIN(CAST(o_orderdate AS DATE)) AS first_day,
        |       MAX(CAST(o_orderdate AS DATE)) AS last_day
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = tmp("orders_csv")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("o_orderdate"))
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      s.read.option("header", "true").schema(ordersCsvSchema).csv(path)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("total"),
          min(col("o_orderdate")).as("first_day"),
          max(col("o_orderdate")).as("last_day"))
        .orderBy(col("o_orderstatus"))
    },

    // S1 variant: the reference's ACTUAL ingestion mode — schema-on-read
    // (inferSchema=true, /root/reference/scripts/01_data_ingestion.py:17-22)
    // followed by explicit casts to the engine types. The explicit-schema
    // path above stays the engine default (SURVEY §3.1: inferSchema costs
    // an extra sampling pass over every file at 100 TB); this query
    // exercises the option and proves infer-then-cast is lossless against
    // the same aggregate oracle as csv_roundtrip_agg.
    Q("csv_inferschema_agg",
      """SELECT o_orderstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total,
        |       MIN(CAST(o_orderdate AS DATE)) AS first_day,
        |       MAX(CAST(o_orderdate AS DATE)) AS last_day
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = tmp("orders_csv_infer")
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), to_date(col("o_orderdate")).as("o_orderdate"))
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
      s.read.option("header", "true").option("inferSchema", "true").csv(path)
        // infer-then-cast: whatever the sampler guessed, the engine types win
        .select(
          col("o_orderstatus").cast(StringType),
          col("o_totalprice").cast(DoubleType),
          col("o_orderdate").cast(DateType))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("total"),
          min(col("o_orderdate")).as("first_day"),
          max(col("o_orderdate")).as("last_day"))
        .orderBy(col("o_orderstatus"))
    },

    // S1 robustness: malformed-record handling. A CSV with DETERMINISTIC
    // bad rows (every o_orderkey % 10 == 0 line carries a non-numeric
    // key) is read back in PERMISSIVE mode — bad cells land as nulls
    // instead of failing the job (the 100 TB reality: a few broken lines
    // must not kill a million-file read; FAILFAST's throw is asserted in
    // OperatorsSpec). The oracle replays the planting arithmetic on the
    // original table, so the check proves Spark's PERMISSIVE semantics
    // recover exactly the undamaged cells.
    Q("csv_permissive_badrows",
      """SELECT o_orderstatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |       CAST(SUM(CASE WHEN o_orderkey % 10 <> 0 THEN o_orderkey ELSE 0 END) AS BIGINT) AS key_sum
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = tmp("orders_csv_bad")
      Tables.orders(s, dir)
        .select(concat(
          when(col("o_orderkey") % 10 === 0, lit("not_a_number"))
            .otherwise(col("o_orderkey").cast("string")),
          lit(","), col("o_orderstatus")).as("value"))
        .write.mode(SaveMode.Overwrite).text(path)
      s.read
        .schema("o_orderkey LONG, o_orderstatus STRING")
        .option("mode", "PERMISSIVE")
        .csv(path)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("o_orderkey").isNull, 1).otherwise(0)).cast("long").as("n_bad"),
          sum(coalesce(col("o_orderkey"), lit(0L))).cast("long").as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },

    // JSON-lines sink → typed JSON scan → aggregate (the third source
    // format; the oracle compares against the ORIGINAL parquet table,
    // so the check proves the JSON sink+scan pair is lossless).
    Q("json_source_roundtrip",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val path = tmp("customer_json")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .write.mode(SaveMode.Overwrite).json(path)
      s.read.schema("c_custkey LONG, c_mktsegment STRING, c_acctbal DOUBLE")
        .json(path)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(30,6)")).cast("double").as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // VARIANT semi-structured extraction (r12): Spark 4's open-format
    // binary VARIANT is the engine's semi-structured story —
    // parse_json once into the typed binary encoding, then
    // variant_get path extraction with result types, no per-access
    // re-parse (the shredded-JSON performance model). A NESTED
    // document is built in-query from event columns (deterministic —
    // both engines assemble the identical string; the raw props are
    // flat, so nesting and array paths would otherwise go
    // unexercised), Spark reads it through parse_json + variant_get
    // ($.meta.type string, $.meta.k long, $.vals[1] 0-based array
    // index), DuckDB replays the same paths with its JSON functions.
    // The VARIANT value itself never leaves the plan (binary out of a
    // declared query is banned); only extracted scalars do. A missing
    // $.k lands as JSON null → typed extraction yields SQL NULL on
    // both engines → SUM skips it.
    Q("ingest_variant_extract",
      """WITH j AS (
        |  SELECT concat('{"meta":{"type":"', event_type, '","k":',
        |                COALESCE(json_extract_string(props, '$.k'), 'null'),
        |                '},"vals":[', CAST(user_id AS VARCHAR), ',',
        |                CAST(user_id * 2 AS VARCHAR), ']}') AS js
        |  FROM events)
        |SELECT json_extract_string(js, '$.meta.type') AS etype,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(json_extract_string(js, '$.meta.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(SUM(CAST(json_extract_string(js, '$.vals[1]') AS BIGINT)) AS BIGINT) AS sum_v1
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val v = "ev_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.events(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""WITH j AS (
           |  SELECT parse_json(concat('{"meta":{"type":"', event_type, '","k":',
           |                    COALESCE(get_json_object(props, '$$.k'), 'null'),
           |                    '},"vals":[', CAST(user_id AS STRING), ',',
           |                    CAST(user_id * 2 AS STRING), ']}')) AS doc
           |  FROM $v)
           |SELECT variant_get(doc, '$$.meta.type', 'string') AS etype,
           |       COUNT(*) AS n,
           |       CAST(SUM(variant_get(doc, '$$.meta.k', 'long')) AS BIGINT) AS sum_k,
           |       CAST(SUM(variant_get(doc, '$$.vals[1]', 'long')) AS BIGINT) AS sum_v1
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // ORC sink → ORC scan → aggregate (columnar alternative to parquet;
    // same lossless-round-trip oracle shape).
    Q("orc_source_roundtrip",
      """SELECT s_nationkey,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      val path = tmp("supplier_orc")
      Tables.supplier(s, dir)
        .write.mode(SaveMode.Overwrite).orc(path)
      s.read.orc(path)
        .groupBy(col("s_nationkey"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("s_acctbal").cast("decimal(30,6)")).cast("double").as("total_bal"))
        .orderBy(col("s_nationkey"))
    },

    // S3 + S4: tuned parquet sink (64 MB row groups, 8 MB pages,
    // snappy) → scan → aggregate.
    Q("parquet_sink_roundtrip",
      """SELECT l_linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val path = tmp("lineitem_parquet")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
          col("l_extendedprice"))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "snappy")
        .option("parquet.block.size", (64 * 1024 * 1024).toString)
        .option("parquet.page.size", (8 * 1024 * 1024).toString)
        .parquet(path)
      s.read.parquet(path)
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double").as("total"))
        .orderBy(col("l_linestatus"))
    },

    // CORRUPT-FILE tolerance (round 7): at a million files, a truncated
    // or garbage file WILL exist, and one broken footer must not kill
    // the scan (the file-source twin of csv_permissive_badrows' row-
    // level story). A garbage .parquet is planted next to the good
    // files; the read opts into ignoreCorruptFiles (the per-read
    // OPTION, not the session conf — no cross-query blast radius) and
    // must recover exactly the good rows, proven by the oracle over
    // the original table. FAILFAST default behavior (the read throws
    // without the option) is asserted in OperatorsSpec.
    Q("parquet_ignore_corrupt",
      """SELECT c_mktsegment,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val path = tmp("customer_corrupt")
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .write.mode(SaveMode.Overwrite).parquet(path)
      Files.write(
        Paths.get(path, "part-99999-garbage.parquet"),
        "this is not a parquet file".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s.read.option("ignoreCorruptFiles", "true").parquet(path)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(30,6)")).cast("double").as("total_bal"))
        .orderBy(col("c_mktsegment"))
    },

    // SCHEMA EVOLUTION scan (round 7): a long-lived 100 TB table
    // accretes files written under different schema versions — the
    // engine must read all generations as ONE table, null-filling
    // columns absent from older files (the alternative, rewriting
    // petabytes on every column add, is not a plan). Two parquet
    // generations are written (v1 lacks o_orderstatus, v2 carries it)
    // and read back with mergeSchema; the oracle replays the
    // generation split on the original table, so the check proves the
    // merged read recovers exactly the union with nulls where v1 had
    // no column.
    Q("parquet_schema_evolution",
      """WITH unioned AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT COALESCE(o_orderstatus, 'pre_v2') AS status,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM unioned
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val path = tmp("orders_evolution")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice")) // generation v1: no status column
        .write.mode(SaveMode.Overwrite).parquet(s"$path/v1")
      base.filter(col("o_orderkey") % 2 === 1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/v2")
      s.read.option("mergeSchema", "true").parquet(s"$path/v1", s"$path/v2")
        .groupBy(coalesce(col("o_orderstatus"), lit("pre_v2")).as("status"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("total"))
        .orderBy(col("status"))
    },

    // Hive-layout partitioned sink + partition-pruned scan — THE 100 TB
    // layout lever: a day-filtered read of a day-partitioned table
    // touches 1/|days| of the files (PartitionFilters, asserted in
    // OperatorsSpec; here the oracle proves the day's CONTENT
    // round-trips losslessly against the unpartitioned original).
    Q("partitioned_sink_prune",
      """SELECT CAST(ts AS DATE) AS day,
        |       COUNT(*) AS n,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS day_value
        |FROM events
        |WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val path = tmp("events_partitioned")
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          to_date(col("ts")).as("day"))
        .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)
      s.read.parquet(path)
        .filter(col("day") === lit(java.sql.Date.valueOf("2024-01-15")))
        .groupBy(col("day"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(30,6)")).cast("double").as("day_value"))
    },

    // DYNAMIC partition pruning — the third 100 TB layout lever
    // (static pruning needs the literal in the query; bucketing
    // pre-pays the shuffle; DPP prunes partitions whose keys are
    // only known at RUNTIME, from the filtered dim side of a join):
    // the fact is written day-partitioned, the dim side is the
    // Monday-filtered day dimension, and Catalyst injects the dim's
    // surviving keys as a subquery partition filter into the fact
    // scan — a 100 TB day-partitioned fact joined to a filtered
    // calendar reads only the matching partitions' files, with no
    // literal date anywhere in the query. OperatorsSpec pins
    // `dynamicpruning` inside THIS declared query's partitionFilters
    // and that only the Monday partitions' files are read. Weekday
    // arithmetic is Spark `weekday` (0 = Monday) ⇔ DuckDB `isodow`
    // (1 = Monday) — pinned explicitly because the engines' default
    // dayofweek numberings disagree. The oracle proves the
    // partitioned round-trip + pruned join lossless against the
    // original table.
    Q("join_dynamic_partition_prune",
      """WITH mondays AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
        |  WHERE isodow(CAST(ts AS DATE)) = 1)
        |SELECT e.day,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) AS day_value
        |FROM (SELECT CAST(ts AS DATE) AS day, value FROM events) e
        |JOIN mondays m ON m.day = e.day
        |GROUP BY e.day
        |ORDER BY e.day""".stripMargin) { (s, dir) =>
      val path = tmp("events_dpp")
      val ev = Tables.events(s, dir)
      ev.select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
        .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(path)
      val mondays = ev.select(to_date(col("ts")).as("day"))
        .filter(weekday(col("day")) === 0).distinct()
      s.read.parquet(path)
        .join(broadcast(mondays), Seq("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(30,6)")).cast("double").as("day_value"))
        .orderBy(col("day"))
    },

    // Bucketed co-located fact-fact join — the OTHER 100 TB layout
    // lever (partitioning prunes files; bucketing pre-pays the join
    // shuffle): both facts are written `bucketBy(join key)` once, and
    // every subsequent join between them needs NO exchange at read
    // time — output partitioning satisfies the join's distribution
    // requirement directly, so a 100 TB × 100 TB join moves zero
    // bytes over the network. The `merge` hint pins the sort-merge
    // path (a broadcast would bypass the bucketing demo at this SF;
    // at 100 TB neither side broadcasts and the hint is a no-op).
    // BucketingSpec pins the zero-exchange claim on THIS declared
    // query's executed plan (no ShuffleExchange below the
    // SortMergeJoin); the oracle proves the bucketed write+read+join
    // is lossless against the plain tables. Scratch tables are
    // session-suffixed (two concurrent drivers never collide) and
    // their data dirs die with the JVM like every Ingest sink.
    Q("join_bucketed_colocated",
      """SELECT o.o_orderstatus,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val oTab = s"graft_bkt_orders_$session"
      val lTab = s"graft_bkt_lineitem_$session"
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", tmp("orders_bkt")).saveAsTable(oTab)
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", tmp("lineitem_bkt")).saveAsTable(lTab)
      s.table(oTab).hint("merge")
        .join(s.table(lTab), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double").as("total_price"))
        .orderBy(col("o_orderstatus"))
    },
  )

  /** Zero-extra-scan pipeline observability: attach row/null/sum
    * metrics to a frame via `observe` so they are collected AS A SIDE
    * EFFECT of whatever action consumes it (a sink write, an
    * aggregate) — at 100 TB the alternative is a second full scan per
    * metric batch. Returns the instrumented frame plus the
    * [[org.apache.spark.sql.Observation]] to read after the action:
    * `rows`, one `nulls_<col>` per audited column, and the exact
    * decimal-summed `sum_<col>` for numeric columns requested.
    * OperatorsSpec pins metrics == direct computation while the only
    * job run is the sink write itself. */
  def observedLoad(df: DataFrame, nullCols: Seq[String], sumCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("rows")) ++
      nullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
      sumCols.map(c =>
        sum(col(c).cast("decimal(30,6)")).cast("double").as(s"sum_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
