package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Holt linear (double exponential) smoothing — the O(1)-state scale path
  * (VERDICT r4 #3; InfluxQL HOLT_WINTERS surface, ref README.md:3).
  *
  * Same math as q_holt_forecast's closed array form (the DuckDB recursive
  * CTE oracle twin): init l=v₂, b=v₂−v₁; step l′ = α·v + (1−α)·(l+b),
  * b′ = γ·(l′−l) + (1−γ)·b; 1-step forecast = l+b, floor-truncated to 4
  * decimals (bit-deterministic across engines, see q_fill_linear note).
  *
  * Execution: ONE shuffle on the series key, an in-partition sort on
  * (key, ts, id), then a single streaming fold per partition — state per
  * series is (n, v1, l, b) regardless of series length. The collect_list
  * array form keeps a hot series' entire history in one aggregation
  * buffer; at 100 TB that buffer is unbounded, this fold is 32 bytes.
  * Pinned by PlanAuditSpec: no collect_list in q_holt_forecast's plan.
  */
object Holt {

  /** Input columns (k, t, i, v) = (series key, event-time micros, unique
    * tie-break id, value); output one row per key: (k, n, forecast) with
    * n = series length and forecast = the 1-step Holt forecast
    * (n = 1 → the single value, passed through un-truncated — matching
    * the oracle's `n = 1` branch).
    */
  def holtByKey(df: DataFrame, alpha: Double, gamma: Double): Dataset[(Long, Long, Double)] = {
    implicit val outEnc = org.apache.spark.sql.Encoders.product[(Long, Long, Double)]
    implicit val inEnc = org.apache.spark.sql.Encoders.product[(Long, Long, Long, Double)]
    df.toDF("k", "t", "i", "v")
      .repartition(col("k"))
      .sortWithinPartitions("k", "t", "i")
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var curKey = 0L
        var n = 0L
        var v1 = 0.0
        var l = 0.0
        var b = 0.0
        def close(): Unit =
          if (n > 0) out += ((curKey, n,
            if (n == 1) v1 else math.floor((l + b) * 10000) / 10000))
        for ((k, _, _, v) <- it) {
          if (n == 0 || k != curKey) {
            close()
            curKey = k; n = 1; v1 = v
          } else {
            n += 1
            if (n == 2) { l = v; b = v - v1 }
            else {
              val lNew = alpha * v + (1 - alpha) * (l + b)
              b = gamma * (lNew - l) + (1 - gamma) * b
              l = lNew
            }
          }
        }
        close()
        out.iterator
      }
  }
}
