package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** The two remaining API front doors (SURVEY §1.6 / builder prompt):
  * `spark.sql(...)` over registered views, and the typed `Dataset[T]`
  * path with case-class Encoders.
  *
  * The typed query is the honest demonstration of when typed code is
  * and isn't appropriate: `groupByKey.mapGroups` is opaque to Catalyst
  * (no partial aggregation, no codegen through the lambda), so it is
  * the right tool ONLY for genuinely imperative per-group logic — here
  * the JVM fold is made exact (long cents, not float sums) so the
  * result is engine-independent and oracle-checkable. For anything
  * expressible as columns, the untyped aggregate is strictly better
  * (map-side combine) — which is what every other query does.
  */
object Typed {

  /** Typed view of an event row (subset of columns). */
  final case class Ev(event_id: Long, user_id: Long, value: Double)

  /** Per-user imperative fold output. */
  final case class UserStats(
      user_id: Long, n_events: Long, max_value: Double, value_cents: Long)

  val defs: Seq[Q] = Seq(

    // spark.sql() front door: the same engine surface through the SQL
    // parser instead of the DataFrame DSL (proves views + parser +
    // the identical Catalyst pipeline). View names are salted per call
    // — Verify runs queries concurrently in ONE session, and temp
    // views are session-scoped.
    // GROUP BY ALL — the Spark 4 / modern-SQL surface that infers the
    // grouping key from the non-aggregate select list (SPARK-40218);
    // DuckDB speaks the identical dialect, so the oracle runs the SAME
    // text — the surface itself is pinned cross-engine, not just the
    // result. Plan-wise it lowers to the ordinary two-key hash
    // aggregate (nothing new at 100 TB — this pins the FRONT DOOR).
    Q("sql_frontdoor_groupby_all",
      """SELECT o_orderstatus, o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
      val v = "orders_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.orders(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority,
           |       COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM $v
           |GROUP BY ALL
           |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
    },

    // SQL PIVOT clause — the relational front door for the
    // wide-reports shape the DSL query pivot_status_priority declares
    // via groupBy().pivot(): Spark's PIVOT (SPARK-24722) with aliased
    // values and aggregates produces the deterministic {value}_{agg}
    // column family; the oracle replays as conditional aggregation
    // (the universal lowering — DuckDB's own PIVOT invents its own
    // column names, so the CASE form IS the portable semantics, and
    // Spark lowers PIVOT to exactly this plan: one hash aggregate
    // over |statuses|·|aggs| conditional lanes, no extra exchange).
    Q("sql_frontdoor_pivot",
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS f_rev,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS o_rev,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(30,6)) END) AS DOUBLE) AS p_rev
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val v = "orders_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.orders(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT * FROM (
           |  SELECT o_orderpriority, o_orderstatus,
           |         CAST(o_totalprice AS DECIMAL(30,6)) AS price FROM $v)
           |PIVOT (
           |  COUNT(*) AS n, CAST(SUM(price) AS DOUBLE) AS rev
           |  FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
           |ORDER BY o_orderpriority""".stripMargin)
    },

    Q("sql_frontdoor_revenue",
      """SELECT o_orderpriority,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val v = "orders_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.orders(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderpriority,
           |       COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM $v
           |WHERE o_orderstatus <> 'F'
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin)
    },

    // LATERAL correlated subquery through the SQL front door (r10
    // s4): each customer's top-2 orders by price — the per-row
    // dependent subquery SQL users reach for before they know the
    // window-function form. Catalyst decorrelates the LATERAL + LIMIT
    // into the same rank-over-partition plan `topk_per_group`
    // declares directly (DSL and SQL meet in one optimizer); DuckDB
    // runs the identical LATERAL text, so the surface is pinned
    // cross-engine. Unique (price DESC, orderkey) order keeps the
    // top-2 deterministic.
    Q("sql_frontdoor_lateral",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o.o_orderkey, o.o_totalprice
        |         FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o.o_totalprice DESC, o.o_orderkey
        |         LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin) { (s, dir) =>
      val vc = "cust_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val vo = "ord_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.customer(s, dir).createOrReplaceTempView(vc)
      Tables.orders(s, dir).createOrReplaceTempView(vo)
      s.sql(
        s"""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
           |FROM $vc c,
           |LATERAL (SELECT o.o_orderkey, o.o_totalprice
           |         FROM $vo o
           |         WHERE o.o_custkey = c.c_custkey
           |         ORDER BY o.o_totalprice DESC, o.o_orderkey
           |         LIMIT 2) t
           |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)
    },

    // Recursive CTE front door (r12): Spark 4 ships WITH RECURSIVE
    // (SPARK-24497), the SQL surface for iterative reachability that
    // previously required the DSL loop forms (BFS/SSSP/k-core). The
    // halving chain s → s div 2 → … → 1 gives every supplier a
    // deterministic ancestry walk with log₂(maxkey) bounded depth —
    // recursion terminates structurally, well under Spark's
    // cteRecursionLevelLimit (100) — and DuckDB executes the
    // identical recursion, so every (k, depth, chain_len) row is
    // hash-pinned. The DSL graph tier remains the scale path (its
    // iterations checkpoint and re-partition); this pins the SQL
    // surface itself.
    Q("sql_frontdoor_recursive",
      """WITH RECURSIVE walk(k, a, d) AS (
        |  SELECT s_suppkey AS k, s_suppkey AS a, 0 AS d FROM supplier
        |  UNION ALL
        |  SELECT k, a // 2, d + 1 FROM walk WHERE a > 1)
        |SELECT k AS s_suppkey, CAST(MAX(d) AS BIGINT) AS depth,
        |       CAST(COUNT(*) AS BIGINT) AS chain_len
        |FROM walk GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
      val v = "supp_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.supplier(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""WITH RECURSIVE walk(k, a, d) AS (
           |  SELECT s_suppkey AS k, s_suppkey AS a, 0 AS d FROM $v
           |  UNION ALL
           |  SELECT k, a div 2, d + 1 FROM walk WHERE a > 1)
           |SELECT k AS s_suppkey, CAST(MAX(d) AS BIGINT) AS depth,
           |       CAST(COUNT(*) AS BIGINT) AS chain_len
           |FROM walk GROUP BY k ORDER BY k""".stripMargin)
    },

    // SQL front door for the CURATION tier (round 7): the native
    // n-gram Generator driven entirely through spark.sql — SQL
    // registration (registerAll / GraftExtensions) + LATERAL VIEW is
    // the surface a SQL-only user gets, and it must produce the same
    // rows the Column API does (the oracle rebuilds the bigrams with
    // DuckDB list arithmetic). Docs with < 2 tokens emit no grams on
    // either engine.
    Q("sql_frontdoor_ngrams",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id,
        |             unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS gram
        |      FROM t WHERE len(w) >= 2)
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.registerAll(s)
      val v = "docs_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.documents(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT doc_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           |       CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
           |FROM $v LATERAL VIEW ngrams(text, 2) t AS pos, gram
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },

    // SQL front door for the CDC generator (r10): LATERAL VIEW
    // cdc_chunks through the registered-function surface — a SQL-only
    // user's view of content-defined chunking must yield the Column
    // API's exact rows (the oracle replays the full cut rule in
    // DuckDB). min/max fingerprints per doc keep the check on exact
    // BIGINTs (a fp SUM would overflow int64).
    Q("sql_frontdoor_cdc", {
      val w = 4; val d = 16
      s"""WITH corpus AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |lens AS (SELECT doc_id, len(l) AS len FROM corpus),
         |gs AS (
         |  SELECT doc_id,
         |         unnest(range(1, greatest(len(l) - ${w - 1}, 0) + 1)) AS i,
         |         unnest(list_transform(range(1, greatest(len(l) - ${w - 1}, 0) + 1),
         |                               i -> array_to_string(l[i:i+${w - 1}], ' '))) AS gram
         |  FROM corpus),
         |cuts AS (
         |  SELECT g.doc_id, (g.i - 1) + $w AS s
         |  FROM gs g JOIN lens USING (doc_id)
         |  WHERE CAST(concat('0x', substr(md5(g.gram), 1, 15)) AS BIGINT) % $d = 0
         |    AND (g.i - 1) + $w < lens.len),
         |starts AS (
         |  SELECT doc_id, s FROM cuts
         |  UNION ALL
         |  SELECT doc_id, 0 AS s FROM lens WHERE len > 0),
         |ch AS (
         |  SELECT st.doc_id, st.s,
         |         COALESCE(LEAD(st.s) OVER (PARTITION BY st.doc_id ORDER BY st.s),
         |                  lens.len) AS e
         |  FROM starts st JOIN lens USING (doc_id)),
         |fp AS (
         |  SELECT ch.doc_id,
         |         CAST(concat('0x', substr(md5(
         |           array_to_string(c.l[ch.s + 1:ch.e], ' ')), 1, 15)) AS BIGINT) AS chunk_fp
         |  FROM ch JOIN corpus c USING (doc_id))
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       MIN(chunk_fp) AS min_fp,
         |       MAX(chunk_fp) AS max_fp
         |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.functions.registerAll(s)
      val v = "docs_" + java.util.UUID.randomUUID().toString.replace("-", "")
      Tables.documents(s, dir).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT doc_id,
           |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
           |       MIN(chunk_fp) AS min_fp,
           |       MAX(chunk_fp) AS max_fp
           |FROM $v LATERAL VIEW cdc_chunks(text, 4, 16) c
           |  AS chunk_idx, start_pos, n_tokens, chunk_fp
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    },

    // Typed Dataset path: case-class Encoders + groupByKey/mapGroups
    // imperative per-group fold. Exactness discipline: values carry 2
    // decimals, so the fold sums LONG CENTS (associative, order-free)
    // instead of doubles — the same reason the money queries aggregate
    // in DECIMAL. max over doubles picks an existing value → also
    // order-free. The shuffle is the groupByKey exchange; there is no
    // partial aggregation (the documented cost of the typed path).
    Q("typed_user_stats",
      """SELECT user_id,
        |       COUNT(*) AS n_events,
        |       MAX(value) AS max_value,
        |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
        .as[Ev]
        .groupByKey(_.user_id)
        .mapGroups { (uid, rows) =>
          var n = 0L
          var mx = Double.MinValue
          var cents = 0L
          rows.foreach { e =>
            n += 1
            if (e.value > mx) mx = e.value
            // HALF_UP on the decimal repr — the same convention as Spark's
            // round() and the DuckDB oracle (math.round is half-toward-+inf,
            // which diverges on negative values landing exactly on .5)
            cents += java.math.BigDecimal.valueOf(e.value * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
          }
          UserStats(uid, n, mx, cents)
        }
        .toDF()
        .orderBy(col("user_id"))
    })
}
