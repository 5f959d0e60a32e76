package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant

/** T14: the streaming CUSUM pipeline reproduces the batch fold exactly —
  * terminal (s⁺, s⁻) and alarm count per series match
  * [[graft.functions.Cusum.cusumByKey]] even when the stream arrives in
  * several micro-batches (state carries the recurrence across batches).
  */
class CusumStreamSpec extends SparkTestBase {

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  test("alarms stream live and the multi-batch fold matches the batch CUSUM") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.cusumAlerts(ms.toDF())
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    def alarms() = spark.table("cusum_out").as[CusumAlarm].collect().toList

    // series 1 drifts high: 160, 160 → s+ = 108 then 216, both alarm.
    // series 2 stays in band: 55s forever, no alarm.
    ms.addData(Ev(0, ts(0), 1, "m", 160.0), Ev(1, ts(1), 1, "m", 160.0),
      Ev(2, ts(0), 2, "m", 55.0), Ev(3, ts(1), 2, "m", 55.0))
    q.processAllAvailable()
    val a1 = alarms()
    assert(a1.map(_.event_id).sorted === List(0L, 1L))
    assert(a1.find(_.event_id == 0L).get.cusum_pos === 108.0)
    assert(a1.find(_.event_id == 1L).get.cusum_pos === 216.0)

    // batch 2: series 1 recovers (30s drain s+), series 2 dips low once —
    // state must have CARRIED s+ = 216 across the batch boundary.
    ms.addData(Ev(4, ts(2), 1, "m", 30.0), Ev(5, ts(3), 1, "m", 30.0),
      Ev(6, ts(2), 2, "m", 55.0))
    q.processAllAvailable()
    // s+ after 30s: 216-22=194, then 172 — both still above band → 2 more alarms
    val a2 = alarms()
    assert(a2.map(_.event_id).sorted === List(0L, 1L, 4L, 5L))
    assert(a2.find(_.event_id == 5L).get.cusum_pos === 172.0)
    q.stop()

    // the batch fold over the SAME samples agrees on alarms and terminal state
    val batch = graft.functions.Cusum.cusumByKey(
      Seq((1L, 0L, 0L, 160.0), (1L, 1L, 1L, 160.0), (1L, 2L, 4L, 30.0), (1L, 3L, 5L, 30.0),
          (2L, 0L, 2L, 55.0), (2L, 1L, 3L, 55.0), (2L, 2L, 6L, 55.0))
        .toDF("user_id", "ts_ns", "event_id", "value"),
      target = 50.0, slack = 2.0, band = 100.0)
      .collect().map(r => r.user_id -> r).toMap
    assert(batch(1L).alarms === 4L && batch(1L).cusum_pos === 172.0)
    assert(batch(2L).alarms === 0L)
    assert(a2.count(_.user_id == 1L).toLong === batch(1L).alarms)
  }

  test("streamed corpus replay matches the batch fold per series (random values)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(7)
    val evs = (0 until 400).map(i =>
      Ev(i.toLong, ts(i), (i % 5).toLong, "m", 40.0 + rnd.nextInt(60)))
    val ms = MemoryStream[Ev]
    val q = Pipelines.cusumAlerts(ms.toDF())
      .writeStream.format("memory").queryName("cusum_out2").outputMode("append").start()
    evs.grouped(150).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("cusum_out2").groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.functions.Cusum.cusumByKey(
      evs.map(e => (e.user_id, e.ts.getTime * 1000000L, e.event_id, e.value))
        .toDF("user_id", "ts_ns", "event_id", "value"),
      target = 50.0, slack = 2.0, band = 100.0)
      .collect().map(r => r.user_id -> r.alarms).toMap
    (0L until 5L).foreach { uid =>
      assert(streamed.getOrElse(uid, 0L) === batch(uid),
        s"series $uid: streamed ${streamed.getOrElse(uid, 0L)} vs batch ${batch(uid)}")
    }
  }
}
