package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, driver-checkable query.
  *
  * Single source of truth for the SparkEntry two-map contract: every
  * module exposes `defs: Seq[Q]`, and SparkEntry derives both
  * `queries` and `oracleSql` from the union. A query with
  * `oracle = None` is intentionally non-SQL-expressible (seeded
  * sampling, LSH bucketing, ML training) and gets the driver's weaker
  * rows-only check plus a ScalaTest invariant in `src/test/scala`.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Oracle-checked query (the default — prefer this). */
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))

  /** Declared-but-unoracled query (sampling / non-deterministic ops). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
