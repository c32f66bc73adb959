package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Data-integrity auditing: ORDER-INDEPENDENT table fingerprints.
  *
  * The 100 TB operations problem this solves: after a migration,
  * replication, backfill, or engine swap, prove two copies of a table
  * are identical without sorting or moving either one. Each row is
  * hashed to a 60-bit key (the repo-wide portable md5-prefix family),
  * and per group the engine folds the keys with COMMUTATIVE
  * aggregates — XOR, a bounded-residue sum, min/max, count — so the
  * fingerprint is invariant to row order, partitioning, and task
  * count. One map-only pass plus a |groups|-row aggregate; the two
  * sides never ship data, only the tiny fingerprint frame.
  *
  * Why this aggregate set: XOR alone is blind to duplicated-pair
  * swaps (x⊕x = 0), a plain SUM of 60-bit keys overflows BIGINT past
  * ~2⁴ rows · 2⁶⁰; together, count + XOR + the 20-bit-residue sum
  * (overflow-safe to ~2⁴³ rows per group) + min/max make any
  * realistic divergence visible. The reference has no audit surface
  * (its checks are manual row-count prints,
  * /root/reference/scripts/01_data_ingestion.py:40-47); this is the
  * distributed replacement.
  *
  * The declared query is the strongest equivalence claim available:
  * DuckDB replays the identical hash + fold arithmetic over the same
  * parquet, so the ORACLE ITSELF is the cross-engine audit.
  */
object Audit {

  private def fp60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Fingerprint `df` grouped by `groupCol`; `rowRepr` must be a
    * canonical, engine-portable string rendering of the row (cast
    * ints/strings explicitly; avoid raw double→string formatting,
    * which engines render differently — hash doubles via their IEEE
    * bits or a fixed-precision round instead). `concat_ws` skips
    * nulls, so null vs empty-string collide — feed explicit sentinels
    * if that distinction matters for the audited table. */
  def tableFingerprint(df: DataFrame, groupCol: String, rowRepr: Column): DataFrame =
    df.select(col(groupCol), fp60(rowRepr).as("h"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        expr("bit_xor(h)").as("xor_fp"),
        sum(col("h") % 1048576).cast("long").as("sum_fp"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))

  /** Row-level diff of two snapshots of a table keyed by `keyCol`:
    * FULL OUTER join on the key comparing 60-bit row hashes —
    * added / removed / changed, unchanged rows dropped. The
    * migration/backfill complement of `tableFingerprint`: the
    * fingerprint says WHETHER two copies diverge, this says WHERE.
    *
    * Scale shape: each side is reduced to (key, 8-byte hash) inside
    * its scan projection — row payloads never shuffle; the join is
    * one key-keyed exchange per side (bucket both snapshots on the
    * key to make it co-located); output is only the divergent keys.
    * `rowRepr` must follow the `tableFingerprint` portability rules
    * (explicit casts, no raw double rendering). */
  def snapshotDiff(
      before: DataFrame, after: DataFrame, keyCol: String, rowRepr: Column): DataFrame = {
    val b = before.select(col(keyCol).as("k"), fp60(rowRepr).as("h_before"))
    val a = after.select(col(keyCol).as("k"), fp60(rowRepr).as("h_after"))
    b.join(a, Seq("k"), "full_outer")
      .select(col("k").as(keyCol),
        when(col("h_before").isNull, lit("added"))
          .when(col("h_after").isNull, lit("removed"))
          .when(col("h_before") =!= col("h_after"), lit("changed"))
          .otherwise(lit("same")).as("status"))
      .filter(col("status") =!= "same")
  }

  /** Data-contract validation (Deequ-lite): evaluate named row-level
    * expectations in ONE aggregate pass — each rule is a boolean
    * Column, violations are `sum(when(!rule, 1))`, so N rules cost one
    * map-side-combined aggregate regardless of N, never one job per
    * rule. Whole-table rules (uniqueness) are expressed as aggregate
    * pairs (count vs approx/count-distinct) by the caller. Returns one
    * row per rule: (rule, n_violations, pass). */
  def contractCheck(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    // rule names are interpolated into the stack() SQL below — restrict
    // them to identifier-safe characters so a quote/backtick in a name
    // fails loudly here instead of breaking the generated query (ADVICE r8)
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"contractCheck: rule name '$name' must match [A-Za-z0-9_]+")
    }
    val sums = rules.map { case (name, rule) =>
      sum(when(!rule, 1).otherwise(0)).cast("long").as(name)
    }
    val wide = df.agg(sums.head, sums.tail: _*)
    val stacked = rules.map { case (name, _) => s"'$name', `$name`" }.mkString(", ")
    wide.select(expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"))
      .withColumn("pass", (col("n_violations") === 0L).cast("int"))
  }

  val defs: Seq[Q] = Seq(

    // The documents table's publishable contract, checked in one
    // aggregate pass; the oracle replays each CASE sum. A planted
    // violation (rule max_chars_400 with a deliberately low bound)
    // proves failures REPORT rather than vanish.
    Q("audit_contract_check",
      """WITH v AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS id_not_null,
        |    CAST(SUM(CASE WHEN length(text) <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS text_nonempty,
        |    CAST(SUM(CASE WHEN lang NOT IN ('en', 'es', 'de', 'fr') THEN 1 ELSE 0 END) AS BIGINT) AS lang_in_enum,
        |    CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_consistent,
        |    CAST(SUM(CASE WHEN length(text) > 400 THEN 1 ELSE 0 END) AS BIGINT) AS max_chars_400
        |  FROM documents),
        |s AS (
        |  SELECT 'id_not_null' AS rule, id_not_null AS n_violations FROM v
        |  UNION ALL SELECT 'text_nonempty', text_nonempty FROM v
        |  UNION ALL SELECT 'lang_in_enum', lang_in_enum FROM v
        |  UNION ALL SELECT 'n_chars_consistent', n_chars_consistent FROM v
        |  UNION ALL SELECT 'max_chars_400', max_chars_400 FROM v)
        |SELECT rule, n_violations,
        |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass
        |FROM s ORDER BY rule""".stripMargin) { (s, dir) =>
      contractCheck(Tables.documents(s, dir), Seq(
        "id_not_null" -> col("doc_id").isNotNull,
        "text_nonempty" -> (length(col("text")) > 0),
        "lang_in_enum" -> col("lang").isin("en", "es", "de", "fr"),
        "n_chars_consistent" -> (col("n_chars") === length(col("text"))),
        "max_chars_400" -> (length(col("text")) <= 400)))
        .orderBy(col("rule"))
    },

    // Planted snapshot evolution: doc_id % 13 removed, % 11 edited,
    // % 17 re-inserted under a shifted id (added). The oracle replays
    // the same row hashes and the same outer-join classification, so
    // the divergent-key SET and each verdict are hash-pinned.
    Q("audit_snapshot_diff",
      """WITH bh AS (
        |  SELECT doc_id AS k,
        |         CAST(concat('0x', substr(md5(concat_ws('|',
        |           CAST(doc_id AS VARCHAR), md5(text))), 1, 15)) AS BIGINT) AS hb
        |  FROM documents),
        |aft AS (
        |  SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' edited' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 17 = 0),
        |ah AS (
        |  SELECT doc_id AS k,
        |         CAST(concat('0x', substr(md5(concat_ws('|',
        |           CAST(doc_id AS VARCHAR), md5(text))), 1, 15)) AS BIGINT) AS ha
        |  FROM aft),
        |d AS (
        |  SELECT COALESCE(bh.k, ah.k) AS doc_id,
        |         CASE WHEN hb IS NULL THEN 'added'
        |              WHEN ha IS NULL THEN 'removed'
        |              WHEN hb <> ha THEN 'changed'
        |              ELSE 'same' END AS status
        |  FROM bh FULL OUTER JOIN ah ON bh.k = ah.k)
        |SELECT doc_id, status FROM d WHERE status <> 'same'
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val after = docs.filter(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      snapshotDiff(docs, after, "doc_id",
        concat_ws("|", col("doc_id").cast("string"), md5(col("text"))))
        .orderBy(col("doc_id"))
    },

    Q("audit_fingerprint",
      """WITH h AS (
        |  SELECT source,
        |         CAST(concat('0x', substr(md5(concat_ws('|',
        |           CAST(doc_id AS VARCHAR), lang, source,
        |           CAST(n_chars AS VARCHAR), md5(text))), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT source,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       bit_xor(h) AS xor_fp,
        |       CAST(SUM(h % 1048576) AS BIGINT) AS sum_fp,
        |       MIN(h) AS min_h,
        |       MAX(h) AS max_h
        |FROM h GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      tableFingerprint(
        Tables.documents(s, dir),
        "source",
        concat_ws("|",
          col("doc_id").cast("string"), col("lang"), col("source"),
          col("n_chars").cast("string"), md5(col("text"))))
        .orderBy(col("source"))
    })
}
