package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant

/** T19: the streaming EWMA control chart reproduces the batch q_ewma_chart
  * fold exactly — per-series alarm counts match the batch SeriesFold
  * spelling across micro-batch boundaries, and each alarm row carries the
  * z an independent driver-side replay computes at that sample.
  */
class EwmaStreamSpec extends SparkTestBase {

  private val Band = 3.0 * (10.0 * math.sqrt(0.2 / 1.8))

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  /** The batch q_ewma_chart fold (QInflux.scala spelling) over an inline
    * frame: (user_id, ewma_terminal, alarms, n). */
  private def batchFold(evs: Seq[Ev]) = {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[(Long, Double, Long, Long)]
    val band = Band // local copy: the fold lambdas must not capture the spec
    graft.functions.SeriesFold.foldByKey(
        evs.map(e => (e.user_id, e.ts.getTime * 1000000L, e.event_id, e.value))
          .toDF("user_id", "ts_ns", "event_id", "value"))(
        v => { val z = 0.2 * v + 0.8 * 50.0
               (z, if (math.abs(z - 50.0) > band) 1L else 0L) })(
        { case ((z, a), v) =>
            val z2 = 0.2 * v + 0.8 * z
            (z2, a + (if (math.abs(z2 - 50.0) > band) 1L else 0L)) })(
        (k, st, n) => (k, st._1, st._2, n))
      .collect().map(t => t._1 -> t._3).toMap
  }

  test("alarms stream live with replay-exact z and multi-batch counts match the batch fold") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(13)
    // series 0 drifts up after sample 150 (sustained small shift — the EWMA
    // chart's own use case); series 1 and 2 stay near target
    val evs = (0 until 300).map { i =>
      val base = if (i % 3 == 0 && i > 150) 62.0 else 50.0
      Ev(i.toLong, ts(i), (i % 3).toLong, "m", base + rnd.nextInt(5) - 2)
    }
    val ms = MemoryStream[Ev]
    val q = Pipelines.ewmaAlerts(ms.toDF())
      .writeStream.format("memory").queryName("ewma_out").outputMode("append").start()
    evs.grouped(120).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("ewma_out").as[EwmaAlarm].collect().toSeq
    assert(streamed.nonEmpty && streamed.forall(_.user_id == 0L),
      "only the drifted series may alarm")

    // counts == batch fold per series (state carried across 3 batches)
    val batch = batchFold(evs)
    val perSeries = streamed.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    (0L until 3L).foreach { uid =>
      assert(perSeries.getOrElse(uid, 0L) === batch(uid),
        s"series $uid: streamed ${perSeries.getOrElse(uid, 0L)} vs batch ${batch(uid)}")
    }

    // each alarm's z == an independent driver replay at that sample
    val expect = evs.filter(_.user_id == 0L).sortBy(e => (e.ts.getTime, e.event_id))
      .scanLeft((Long.MinValue, 50.0)) { case ((_, z), e) =>
        (e.event_id, 0.2 * e.value + 0.8 * z) }
      .drop(1).filter { case (_, z) => math.abs(z - 50.0) > Band }
    assert(streamed.sortBy(_.event_id).map(a => (a.event_id, a.ewma)) === expect)
  }

  test("an in-band series never alarms even across many tiny batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = (0 until 40).map(i => Ev(i.toLong, ts(i), 1L, "m", 50.0 + (i % 5) - 2))
    val ms = MemoryStream[Ev]
    val q = Pipelines.ewmaAlerts(ms.toDF())
      .writeStream.format("memory").queryName("ewma_out2").outputMode("append").start()
    evs.foreach { e => ms.addData(e); q.processAllAvailable() }
    q.stop()
    assert(spark.table("ewma_out2").count() === 0L)
    assert(batchFold(evs)(1L) === 0L)
  }
}
