package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply unimpeded; the only special case is `events`:
  * its `ts` column is parquet TIMESTAMP(NANOS, isAdjustedToUTC=false),
  * which Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).  We read
  * nanos as a raw long (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild
  * a microsecond TimestampType column.  Integer division only — epoch
  * nanos (~1.7e18) exceed a Double's 2^53 exact-integer range, so any
  * float math here would corrupt timestamps.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with `ts` restored to a proper (microsecond) TimestampType.
    *
    * The raw nanosecond column survives as `ts_ns`: predicates on the
    * DERIVED `ts` cannot reach the parquet scan, so time-range queries
    * filter on `ts_ns` instead — that pushes down to row-group min/max
    * stats, which is what makes a time-bounded scan cheap at 100 TB.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}
