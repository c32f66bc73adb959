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
  )
}
