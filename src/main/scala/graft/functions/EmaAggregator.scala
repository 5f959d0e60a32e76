package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Order-sensitive exponential moving average as a typed Aggregator
  * (SURVEY.md §2.10 D4 — the "forecasting" surface, ref README.md:3).
  *
  * Input rows are (tsMicros, value); the EMA folds values in event-time
  * order: ema₀ = v₀; emaᵢ = α·vᵢ + (1−α)·emaᵢ₋₁.
  *
  * The buffer collects (ts, value) pairs and `finish` sorts once — correct
  * under Spark's unordered partial aggregation. Memory is O(rows per key);
  * for series too long for that (100 TB), the scale path is
  * `repartition(key).sortWithinPartitions(ts)` + a single mapPartitions
  * fold, which streams in O(1) memory — same math, no per-key buffer.
  */
class EmaAggregator(alpha: Double)
    extends Aggregator[(Long, Long, Double), ArrayBuffer[(Long, Double)], Double] {

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Double)], in: (Long, Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += ((in._2, in._3)); b
  }

  override def merge(a: ArrayBuffer[(Long, Double)], b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    a ++= b; a
  }

  override def finish(b: ArrayBuffer[(Long, Double)]): Double = {
    if (b.isEmpty) Double.NaN
    else {
      val sorted = b.sortBy(_._1)
      sorted.tail.foldLeft(sorted.head._2)((ema, tv) => alpha * tv._2 + (1 - alpha) * ema)
    }
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
