package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** MACD (moving-average convergence/divergence), streamed — the TA panel's
  * trend indicator next to EMA/RSI/KAMA (SURVEY.md §2 extension): fast and
  * slow EMAs of the series, their difference (the MACD line), an EMA of
  * that difference (the signal line), and the histogram crossings that
  * chartists read as trend flips.
  *
  * Recurrence per series in event-time order (ties by unique id), all three
  * EMAs FUSED into one fold — the TRIX lesson (PERF.md r9): three chained
  * `aggregate` HOFs re-inline quadratically under CollapseProject, one fold
  * carrying (ef, es, sg) stays linear. Seeds: ef=es=v₁ (the q_ema seed
  * convention), so macd₁=0 and the signal seeds at 0.
  *
  *   ef' = ef + αf·(v − ef)      αf = 2/13  (12-period fast)
  *   es' = es + αs·(v − es)      αs = 2/27  (26-period slow)
  *   m'  = ef' − es'
  *   sg' = sg + αg·(m' − sg)     αg = 2/10  (9-period signal)
  *   crossings += 1 when (m' − sg')·(m − sg) < 0   (histogram sign flip)
  *
  * Same O(1)-state shape as [[Cusum.cusumByKey]]: one shuffle on the series
  * key, in-partition sort, a group-adjacent streaming fold — no
  * `collect_list` buffer, so a year of 1 Hz samples never materializes in
  * one aggregation buffer. Left-to-right op order matches the DuckDB
  * recursive-CTE oracle exactly; floor-truncation only at the end
  * (Q.scala parity rules).
  */
object Macd {

  val AlphaFast = 2.0 / 13.0
  val AlphaSlow = 2.0 / 27.0
  val AlphaSig  = 2.0 / 10.0

  /** One output row per series key: terminal MACD state + crossing count. */
  case class MacdRow(user_id: Long, macd: Double, signal_line: Double,
                     histogram: Double, crossings: Long, n_points: Long)

  /** Input columns (any names): key LONG, orderTs LONG, tieId LONG, value
    * DOUBLE. Series with one sample report macd=signal=histogram=0.
    */
  def macdByKey(df: DataFrame): Dataset[MacdRow] = {
    implicit val inEnc  = Encoders.product[(Long, Long, Long, Double)]
    implicit val outEnc = Encoders.product[MacdRow]
    df.toDF("k", "t", "i", "v")
      .repartition(col("k"))
      .sortWithinPartitions("k", "t", "i")
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        val rows = it.buffered
        new Iterator[MacdRow] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): MacdRow = {
            val k = rows.head._1
            val v0 = rows.next()._4
            var ef = v0; var es = v0; var m = 0.0; var sg = 0.0
            var crossings = 0L; var n = 1L
            while (rows.hasNext && rows.head._1 == k) {
              val v = rows.next()._4
              ef = ef + AlphaFast * (v - ef)
              es = es + AlphaSlow * (v - es)
              val m2 = ef - es
              val sg2 = sg + AlphaSig * (m2 - sg)
              if ((m2 - sg2) * (m - sg) < 0) crossings += 1
              m = m2; sg = sg2
              n += 1
            }
            MacdRow(k, m, sg, m - sg, crossings, n)
          }
        }
      }
  }
}
