package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declarative query of the engine's operator inventory (SURVEY.md §2).
  *
  * @param name   stable key, matches SURVEY.md §2's `query key` column
  * @param doc    one-line description + the operator it exercises
  * @param run    Spark-side implementation; `dir` is a testdata sf directory
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables
  *               (None for ops not expressible in portable SQL — the driver
  *               then records a weaker rows-only check)
  */
final case class GraftQuery(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** Convenience constructor for oracle-checked queries. */
  def apply(name: String, doc: String, sql: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, doc, fn, Some(sql))

  /** Convenience constructor for rows-only (non-SQL-expressible) queries. */
  def rowsOnly(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, doc, fn, None)
}
