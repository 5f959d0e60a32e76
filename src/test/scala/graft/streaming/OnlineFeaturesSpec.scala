package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant

/** T15: the online feature pipeline emits exactly the batch q_lag_features
  * rows (same warm-up cut, same lag/rolling-mean/target values) even when
  * the stream arrives in several micro-batches — the feature-store
  * contract: what serving computes at ingest equals what training
  * backfills.
  */
class OnlineFeaturesSpec extends SparkTestBase {

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  test("streamed features == batch window features across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val evs = (0 until 300).map(i =>
      Ev(i.toLong, ts(i), (i % 4).toLong, "m", math.round(rnd.nextDouble() * 10000) / 100.0))

    val ms = MemoryStream[Ev]
    val q = Pipelines.onlineFeatures(ms.toDF())
      .writeStream.format("memory").queryName("feat_out").outputMode("append").start()
    // three uneven batches: warm-up, mid-series, and tail all cross a boundary
    Seq(evs.take(30), evs.slice(30, 170), evs.drop(170)).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("feat_out").as[FeatureRow].collect()
      .sortBy(_.event_id)

    // the batch spelling (the q_lag_features plan over the same rows)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(-4, Window.currentRow)
    val batch = evs.toDF()
      .withColumn("rn", row_number().over(w))
      .withColumn("lag1", lag(col("value"), 1).over(w))
      .withColumn("lag2", lag(col("value"), 2).over(w))
      .withColumn("roll_mean5", round(avg(col("value")).over(wf), 4))
      .withColumn("target", lead(col("value"), 1).over(w))
      .filter(col("rn") >= 5 && col("target").isNotNull)
      .select("event_id", "user_id", "value", "lag1", "lag2", "roll_mean5", "target")
      .as[FeatureRow].collect().sortBy(_.event_id)

    assert(streamed.length === batch.length && batch.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) => assert(s === b) }
  }

  test("warm-up and tail: no rows before 5 samples, the last sample closes no row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.onlineFeatures(ms.toDF())
      .writeStream.format("memory").queryName("feat_out2").outputMode("append").start()
    ms.addData((0 until 5).map(i => Ev(i.toLong, ts(i), 1L, "m", i * 10.0)))
    q.processAllAvailable()
    // 5 samples: row #5 is pending, nothing emitted yet
    assert(spark.table("feat_out2").count() === 0L)
    ms.addData(Ev(5, ts(5), 1L, "m", 99.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("feat_out2").as[FeatureRow].collect()
    assert(rows.length === 1)
    val r = rows.head
    // sample 4 (value 40) closed by sample 5 (99): lags 30/20, mean of 0..40
    assert(r.event_id === 4L && r.value === 40.0 && r.lag1 === 30.0 &&
      r.lag2 === 20.0 && r.roll_mean5 === 20.0 && r.target === 99.0)
  }
}
