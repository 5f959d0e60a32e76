package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (q_downsample_1m — the InfluxQL `GROUP BY time(1m)`
    * continuous-query surface, ref README.md:3) on sf0.001; driver
    * smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_downsample_1m").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (the
    * driver then records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
