package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

/** T12: the deadman pipeline fires exactly one alert per silence, only
  * after the watermark passes last_seen + gap, and re-arms when the
  * series returns.
  */
class DeadmanSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L))

  test("series that goes silent past the gap alerts once, then re-arms on return") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Ev]
    // gap 1 minute, zero watermark delay: silence is measured purely in
    // event time supplied through the stream
    val q = Pipelines.deadman(ms.toDF(), gapMs = 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("deadman_out").outputMode("append").start()

    def alerts() = spark.table("deadman_out").as[DeadmanAlert].collect().toList

    // batch 1: both series alive through minute 2
    ms.addData(Ev(0, ts(0), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0),
      Ev(2, ts(0), 2, "view", 1.0), Ev(3, ts(2), 2, "view", 1.0))
    q.processAllAvailable()
    assert(alerts().isEmpty) // watermark at minute 2, nobody past gap

    // batch 2: only series 1 reports (minute 10) → watermark jumps to 10
    ms.addData(Ev(4, ts(10), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 3 (any batch after the watermark advance): series 2's timeout
    // (last_seen 2 + gap 1 < wm 10) fires
    ms.addData(Ev(5, ts(11), 1, "click", 1.0))
    q.processAllAvailable()
    // silent_for_ms is the OBSERVED silence (watermark at fire time − last
    // seen), not the configured gap: series 2 last reported minute 2 and the
    // timeout fired once the watermark reached minute 10 → 8 min silent.
    assert(alerts() === List(DeadmanAlert(2, ts(2), 480000L)))

    // series 2 returns at minute 12 → re-armed; series 1 then goes silent
    ms.addData(Ev(6, ts(12), 2, "view", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(7, ts(30), 2, "view", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(8, ts(31), 2, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val fin = alerts().toSet
    // series 1 last reported minute 11; its timeout fires once the watermark
    // passes minute 12 — i.e. at watermark 30 → observed silence 19 min.
    assert(fin === Set(DeadmanAlert(2, ts(2), 480000L), DeadmanAlert(1, ts(11), 1140000L)))
  }
}
