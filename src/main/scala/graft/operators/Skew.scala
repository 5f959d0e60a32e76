package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4) — the 100 TB answer to hot series keys
  * (one chatty PLC/tag dominating a partition).
  *
  * AQE's skew-join split handles joins at runtime; for AGGREGATIONS over a
  * skewed key the classic fix is two-stage salted aggregation: stage 1
  * aggregates on (key, salt) so a hot key's rows spread over `salts`
  * reducers, stage 2 merges the partials. Only algebraic aggregates
  * decompose this way (sum/count/min/max — avg = sum/count); holistic ones
  * (exact percentile) need sketches instead.
  *
  * The salt must be uniform and cheap, NOT the grouping key's hash (that
  * would put the whole hot key back on one reducer). Row identity hashed
  * with a different seed works and stays deterministic for a fixed input
  * partitioning.
  */
object Skew {

  /** avg(valueCol) by keyCol, skew-resistant. Result column: `avg_<value>`. */
  def saltedAvg(df: DataFrame, keyCol: String, valueCol: String, salts: Int = 32): DataFrame = {
    val salt = pmod(hash(col(valueCol), spark_partition_id(), monotonically_increasing_id()), lit(salts))
    df.groupBy(col(keyCol), salt.as("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(col(valueCol)).as("_c"))
      .groupBy(col(keyCol))
      .agg((sum(col("_s")) / sum(col("_c"))).as(s"avg_$valueCol"))
  }

  /** Partial (stage-1) frame — exposed so tests can assert the hot key
    * really spreads across `salts` partial groups.
    */
  def saltedPartials(df: DataFrame, keyCol: String, valueCol: String, salts: Int = 32): DataFrame = {
    val salt = pmod(hash(col(valueCol), spark_partition_id(), monotonically_increasing_id()), lit(salts))
    df.groupBy(col(keyCol), salt.as("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(col(valueCol)).as("_c"))
  }
}
