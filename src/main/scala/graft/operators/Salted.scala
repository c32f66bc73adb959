package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Skew-resistant two-phase aggregation (the builder-prompt "salting
  * for skew" posture, SURVEY §4.2 scale rules).
  *
  * A single hot grouping key serializes one reducer at 100 TB. The
  * salted form aggregates twice:
  *
  *   phase 1: groupBy(key, salt)  — the hot key fans out over `salts`
  *            reducers (salt derived by hashing stable row columns, so
  *            the plan stays deterministic — no rand());
  *   phase 2: groupBy(key)        — combines `salts` partials per key;
  *            input is |keys|·salts rows, trivially small.
  *
  * Works for any algebraic aggregate (sum/count/min/max); the wrapper
  * here exposes sum+count. Results are EXACTLY the plain groupBy's
  * (decimal sums are order-independent) — which is why the declared
  * query can be oracle-checked against a plain GROUP BY.
  *
  * Note Spark's own partial aggregation (map-side combine) already
  * handles skew for algebraic aggregates; explicit salting is the
  * pattern for the cases partial agg can't cover (collect_list-like
  * holistic aggs, or skewed JOIN keys — for joins see AQE's
  * skewJoin + the broadcast patterns in graft.queries.Relational).
  */
object Salted {

  /** Two-phase salted sum/count over `valueCol` grouped by `keyCol`.
    * `saltSource` columns must be non-null and roughly uniform. */
  def sumSalted(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltSource: Seq[String],
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(saltSource.map(col): _*), lit(salts)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        sum(col(valueCol).cast("decimal(30,6)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_psum")).cast("double").as("total"),
        sum(col("_pcnt")).cast("long").as("n"))
  }

  /** Skew-defused shuffle equi-join: the fact side gets a
    * deterministic salt in [0, salts) hashed from stable columns; the
    * (smaller, but too big / too hot to broadcast) `dim` side is
    * replicated `salts` times; the join keys on (key, salt). A hot key
    * then fans out over `salts` reducers instead of serializing one.
    * Cost model: |dim| × salts replication buys |hottest key| / salts
    * per-reducer ceiling — the right trade whenever the dim fits
    * memory×salts but not the broadcast threshold, or AQE's skew-join
    * splitting is unavailable (it only handles SMJ without requiring
    * co-partitioned output). Salting is invisible in the result, so
    * the declared query oracle-checks against the PLAIN join. */
  def joinSalted(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      saltSource: Seq[String],
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_fsalt",
      pmod(hash(saltSource.map(col): _*), lit(salts)))
    val saltedDim = dim.withColumn("_dsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) && col("_fsalt") === col("_dsalt"))
      .drop("_fsalt", "_dsalt")
  }

  val defs: Seq[Q] = Seq(
    // Salting must be invisible in the result: oracle is the PLAIN
    // group-by. (DuckDB never sees the salt; decimal sums make the
    // two-phase total exact.)
    Q("agg_salted_sum",
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      sumSalted(
        Tables.lineitem(s, dir),
        keyCol = "l_returnflag", valueCol = "l_quantity",
        saltSource = Seq("l_orderkey", "l_linenumber"))
        .orderBy(col("l_returnflag"))
    },

    // Salted shuffle join, same invisibility contract: oracle is the
    // PLAIN join + group-by. The dim side is intentionally joined
    // without a broadcast hint — the salt pattern exists precisely for
    // the not-broadcastable case.
    Q("join_salted_skew",
      """SELECT o.o_orderpriority,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, dir) =>
      joinSalted(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"), col("l_linenumber")),
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        factKey = "l_orderkey", dimKey = "o_orderkey",
        saltSource = Seq("l_orderkey", "l_linenumber"),
        salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(30,6)")).cast("double").as("total_qty"))
        .orderBy(col("o_orderpriority"))
    },
  )
}
