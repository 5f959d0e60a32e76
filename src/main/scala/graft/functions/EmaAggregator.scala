package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Order-sensitive exponential moving average as a typed Aggregator
  * (SURVEY.md §2.10 D4 — the "forecasting" surface, ref README.md:3).
  *
  * Input rows are (key, tsMicros, uniqueId, value); the EMA folds values in
  * event-time order: ema₀ = v₀; emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁. The fold order
  * is tie-broken by the unique id, so rows with equal timestamps fold the
  * same way regardless of how partial-aggregation buffers were merged.
  *
  * The buffer collects (ts, id, value) triples and `finish` sorts once —
  * correct under Spark's unordered partial aggregation. Memory is O(rows
  * per key); for series too long for that (100 TB), the scale path is
  * `repartition(key).sortWithinPartitions(ts, id)` + a single mapPartitions
  * fold, which streams in O(1) memory — same math, no per-key buffer.
  */
class EmaAggregator(alpha: Double)
    extends Aggregator[(Long, Long, Long, Double), ArrayBuffer[(Long, Long, Double)], Double] {

  override def zero: ArrayBuffer[(Long, Long, Double)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Long, Double)], in: (Long, Long, Long, Double)): ArrayBuffer[(Long, Long, Double)] = {
    b += ((in._2, in._3, in._4)); b
  }

  override def merge(a: ArrayBuffer[(Long, Long, Double)], b: ArrayBuffer[(Long, Long, Double)]): ArrayBuffer[(Long, Long, Double)] = {
    a ++= b; a
  }

  override def finish(b: ArrayBuffer[(Long, Long, Double)]): Double = {
    if (b.isEmpty) Double.NaN
    else {
      val sorted = b.sortBy(t => (t._1, t._2))
      sorted.tail.foldLeft(sorted.head._3)((ema, tv) => alpha * tv._3 + (1 - alpha) * ema)
    }
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Ema {

  /** The 100 TB path: one shuffle on the series key, an in-partition sort,
    * then a single streaming fold per partition — O(1) state per series
    * regardless of series length (vs the Aggregator's O(rows) buffer).
    * Input rows are (key, tsMicros, uniqueId, value); output (key, ema).
    * The in-partition sort is tie-broken by the unique id, matching the
    * Aggregator's fold order on equal timestamps.
    */
  def emaByKey(ds: org.apache.spark.sql.Dataset[(Long, Long, Long, Double)], alpha: Double)
      : org.apache.spark.sql.Dataset[(Long, Double)] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Double)]
    // seed = first value (ema₁ = v₁), then the standard recursion — the
    // shared SeriesFold scaffolding (one shuffle + in-partition sort +
    // group-adjacent fold, O(1) state per series).
    SeriesFold.foldByKey(ds.toDF())(v => v)(
      (e, v) => alpha * v + (1 - alpha) * e)(
      (k, e, _) => (k, e))
  }
}
