package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** The shared O(1)-state per-series streaming fold behind EMA, CUSUM and
  * MACD (r10 — the scaffolding previously lived as three verbatim copies):
  * one shuffle on the series key, an in-partition (key, ts, tie) sort,
  * then a group-adjacent fold that carries ONLY the caller's state struct —
  * no collect_list buffer, so a year of 1 Hz samples never materializes in
  * one aggregation buffer (the scale contract PlanAuditSpec pins on the
  * q_cusum/q_macd plans).
  *
  * Input columns (any names): key LONG, orderTs LONG, tieId LONG, value
  * DOUBLE. `seed` opens a series at its first value (fold the first sample
  * into the seed when the recurrence updates on every row — CUSUM — or
  * anchor the state at it when the first value IS the state — EMA/MACD);
  * `step` folds each later value; `emit` maps (key, final state, n) to the
  * one output row per series.
  */
object SeriesFold {

  def foldByKey[S, O: Encoder](df: DataFrame)(seed: Double => S)(
      step: (S, Double) => S)(emit: (Long, S, Long) => O): Dataset[O] = {
    implicit val inEnc: Encoder[(Long, Long, Long, Double)] =
      Encoders.product[(Long, Long, Long, Double)]
    df.toDF("k", "t", "i", "v")
      .repartition(col("k"))
      .sortWithinPartitions("k", "t", "i")
      .as[(Long, Long, Long, Double)]
      .mapPartitions { it =>
        // Group-adjacent streaming fold: each next() consumes one whole
        // series run and emits its terminal row — nothing is buffered.
        val rows = it.buffered
        new Iterator[O] {
          override def hasNext: Boolean = rows.hasNext
          override def next(): O = {
            val k = rows.head._1
            var st = seed(rows.next()._4)
            var n = 1L
            while (rows.hasNext && rows.head._1 == k) {
              st = step(st, rows.next()._4)
              n += 1
            }
            emit(k, st, n)
          }
        }
      }
  }
}
