package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query (SURVEY.md §5.2.1).
  *
  * @param name   stable query id (key in `SparkEntry.queries`)
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None for non-SQL-expressible / non-deterministic
  *               ops (driver then records a weaker rows-only check, and a
  *               ScalaTest invariant covers semantics instead)
  * @param run    the Spark implementation; second arg is the sf directory
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Deterministic-output convention: every declared query ends in a total
    * ORDER BY, floats are rounded, and column names match the oracle SQL
    * exactly (the driver hash-compares by sorted column name).
    */
  def apply(name: String, oracleSql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracleSql.stripMargin.trim), run)

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None, run)
}
