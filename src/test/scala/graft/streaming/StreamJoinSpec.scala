package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

case class Cmd(cmd_id: Long, user_id: Long, cts: Timestamp, action: String)

/** T13: the stream–stream interval join emits exactly the sample/command
  * pairs inside the ±tolerance event-time band, across micro-batches in
  * either arrival order.
  */
class StreamJoinSpec extends SparkTestBase {

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  test("samples correlate with commands within ±60s on the same series only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = MemoryStream[Ev]
    val cmds = MemoryStream[Cmd]
    val q = Pipelines.correlate(evs.toDF(), cmds.toDF(), toleranceSec = 60)
      .writeStream.format("memory").queryName("corr_out").outputMode("append").start()

    // commands arrive FIRST (buffered in join state), samples later
    cmds.addData(Cmd(100, 1, ts(30), "setpoint"), // within 60s of event 0
      Cmd(101, 1, ts(500), "reset"),              // matches nothing
      Cmd(102, 2, ts(40), "setpoint"))            // user 2 — not user 1's events
    q.processAllAvailable()
    evs.addData(Ev(0, ts(10), 1, "click", 1.0),   // pairs with cmd 100
      Ev(1, ts(200), 1, "click", 1.0),            // no command in band
      Ev(2, ts(35), 2, "view", 1.0))              // pairs with cmd 102
    q.processAllAvailable()
    // a second wave the other way round: sample first, command later
    evs.addData(Ev(3, ts(600), 2, "view", 1.0))
    q.processAllAvailable()
    cmds.addData(Cmd(103, 2, ts(650), "calibrate")) // within 60s of event 3
    q.processAllAvailable()
    q.stop()

    val got = spark.table("corr_out")
      .select("event_id", "cmd_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 100L), (2L, 102L), (3L, 103L)))
  }
}
