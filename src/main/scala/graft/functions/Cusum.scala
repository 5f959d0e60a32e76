package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** Tabular CUSUM control chart, streamed (SURVEY.md §2 W13 — the SPC drift
  * detector behind the reference's alarm panels, ref README.md:3 Grafana
  * alerting).
  *
  * Recurrence per series, in event-time order (ties broken by unique id):
  * s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (vᵢ − target) − slack),
  * s⁻ᵢ = max(0, s⁻ᵢ₋₁ − (vᵢ − target) − slack),
  * alarm when either side exceeds `band` AFTER the update.
  *
  * This is the 100 TB path promised in the q_cusum registry entry: one
  * shuffle on the series key, an in-partition sort, then one streaming fold
  * carrying exactly (s⁺, s⁻, alarms, n) — O(1) state per series regardless
  * of length, vs the `collect_list` + `aggregate` HOF spelling that
  * materializes every sample of a series in a single aggregation buffer
  * (a year of 1 Hz samples = 31M structs in one buffer → executor OOM).
  * Same shape as [[Ema.emaByKey]]; CusumByKeySpec pins both spellings equal.
  */
object Cusum {

  /** One output row per series key. */
  case class CusumRow(user_id: Long, cusum_pos: Double, cusum_neg: Double,
                      alarms: Long, n_points: Long)

  /** Input columns (any names): key LONG, orderTs LONG, tieId LONG, value
    * DOUBLE. Output is keyed by `user_id` to match the q_cusum registry
    * shape; callers with a different key name re-alias afterwards.
    */
  def cusumByKey(df: DataFrame, target: Double, slack: Double, band: Double): Dataset[CusumRow] = {
    implicit val inEnc  = Encoders.product[(Long, Long, Long, Double)]
    implicit val outEnc = Encoders.product[CusumRow]
    df.toDF("k", "t", "i", "v")
      .repartition(col("k"))
      .sortWithinPartitions("k", "t", "i")
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        // Group-adjacent streaming fold: each next() consumes one whole
        // series run and emits its terminal state — nothing is buffered.
        val rows = it.buffered
        new Iterator[CusumRow] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): CusumRow = {
            val k = rows.head._1
            var sp = 0.0; var sn = 0.0; var alarms = 0L; var n = 0L
            while (rows.hasNext && rows.head._1 == k) {
              val v = rows.next()._4
              sp = math.max(0.0, sp + (v - target) - slack)
              sn = math.max(0.0, sn - (v - target) - slack)
              if (sp > band || sn > band) alarms += 1
              n += 1
            }
            CusumRow(k, sp, sn, alarms, n)
          }
        }
      }
  }
}
