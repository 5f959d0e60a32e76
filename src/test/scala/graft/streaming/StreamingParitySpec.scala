package graft.streaming

import graft.SparkTestBase
import graft.queries.QStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import java.time.Instant

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Batch/stream parity over MemoryStream (SURVEY §5.4): the same plan
  * functions power q_stream_* (oracle-checked in batch) and the
  * watermarked streaming pipelines.
  */
class StreamingParitySpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L))

  private val base = Seq(
    Ev(0, ts(1), 1, "click", 10.0), Ev(1, ts(4), 1, "click", 20.0),
    Ev(2, ts(12), 2, "view", 30.0), Ev(3, ts(14), 1, "click", 40.0),
    Ev(4, ts(25), 2, "view", 50.0), Ev(5, ts(26), 1, "view", 60.0))
  // Far-future flush row advances the watermark past every base window.
  private val flush = Ev(99, ts(24 * 60), 9, "flush", 0.0)

  test("tumbling window: stream (append + watermark) == batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.tumbling(ms.toDF(), "30 seconds")
      .writeStream.format("memory").queryName("tumbling_out").outputMode("append").start()
    ms.addData(base: _*)
    q.processAllAvailable()
    ms.addData(flush)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out").collect().map(_.toSeq).toSet
    val batch = QStream.tumbling(base.toDF()).collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("session window: stream (append + watermark) == batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.session(ms.toDF(), "30 seconds")
      .writeStream.format("memory").queryName("session_out").outputMode("append").start()
    ms.addData(base: _*)
    q.processAllAvailable()
    ms.addData(flush)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("session_out").collect().map(_.toSeq).toSet
    val batch = QStream.session(base.toDF()).collect().map(_.toSeq).toSet
    assert(streamed === batch)
  }

  test("InfluxQL CREATE CONTINUOUS QUERY: watermarked stream rollup == batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val cq =
      """CREATE CONTINUOUS QUERY cq_1m ON plc
        |BEGIN SELECT MEAN(value) AS m, COUNT(value) AS n FROM events
        |      WHERE event_type = 'click' GROUP BY time(5m), user_id END""".stripMargin
    val ms = MemoryStream[Ev]
    val q = Pipelines.continuousFromInfluxQL(ms.toDF(), cq, "30 seconds")
      .writeStream.format("memory").queryName("cq_out").outputMode("append").start()
    ms.addData(base: _*)
    q.processAllAvailable()
    // The flush row must be IN the filtered series: Spark pushes the tag
    // predicate below the watermark node, so only 'click' rows advance
    // this CQ's watermark (see InfluxQLPlanner.continuous scaladoc). Its
    // own far-future window stays unfinalized → not emitted.
    ms.addData(Ev(99, ts(24 * 60), 9, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cq_out").collect().map(_.toSeq).toSet
    // batch twin: the SAME planner over the static frame
    val batch = Pipelines.continuousFromInfluxQL(base.toDF(), cq)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("stateful change-detect: stream (state across micro-batches) == batch twin") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // bands: u1 → 0,1,1,2 (emit 0,1,2); u2 → 1,1 (emit first only)
    val b1 = Seq(
      Ev(0, ts(1), 1, "click", 10.0), Ev(1, ts(4), 1, "click", 120.0),
      Ev(2, ts(12), 2, "view", 130.0))
    val b2 = Seq(
      Ev(3, ts(14), 1, "click", 150.0),   // same band as event 1 → suppressed
      Ev(4, ts(25), 2, "view", 199.0),    // same band → suppressed (state crossed batches)
      Ev(5, ts(26), 1, "view", 260.0))    // new band → emitted
    val ms = MemoryStream[Ev]
    val q = Pipelines.changeDetect(ms.toDF())
      .writeStream.format("memory").queryName("change_out").outputMode("append").start()
    ms.addData(b1: _*)
    q.processAllAvailable()
    ms.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("change_out").collect().map(_.toSeq).toSet
    val batch = QStream.changeBands((b1 ++ b2).toDF()).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.size === 4)   // events 0, 1, 2, 5
  }

  test("stream-stream config-update join: updates apply within their validity window only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val points = MemoryStream[(Timestamp, String, Int, Double)]
    val updates = MemoryStream[(Timestamp, String, Int, String)]
    val joined = Pipelines.joinConfigUpdates(
      points.toDF().toDF("ts", "measurement", "tag_idx", "value"),
      updates.toDF().toDF("uts", "u_plc", "u_idx", "u_alias"),
      validity = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("cfgjoin_out")
      .outputMode("append").start()
    // update at minute 0 is valid for [0, 10); point at minute 5 matches,
    // point at minute 30 is past validity; the unknown tag never matches.
    updates.addData((ts(0), "10.0.0.1", 0, "temp_v2"))
    points.addData(
      (ts(5), "10.0.0.1", 0, 42.0),
      (ts(30), "10.0.0.1", 0, 43.0),
      (ts(5), "10.0.0.1", 1, 44.0))
    q.processAllAvailable()
    // advance both watermarks far past everything so all results are final
    updates.addData((ts(24 * 60), "zz", 9, "flush"))
    points.addData((ts(24 * 60), "zz", 8, 0.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("cfgjoin_out")
      .select("alias", "value").as[(String, Double)].collect().toSet
    assert(out === Set(("temp_v2", 42.0)))
  }

  test("streaming dedup within watermark drops duplicate event_ids") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Pipelines.dedup(ms.toDF(), "30 seconds")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    ms.addData(base ++ base.map(e => e.copy(value = e.value + 999)): _*) // dup ids
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_out").select("event_id", "value").as[(Long, Double)].collect()
    assert(streamed.map(_._1).sorted === base.map(_.event_id).sorted)  // one row per id
    assert(streamed.forall(r => base.exists(e => e.event_id == r._1 && e.value == r._2))) // first wins
  }
}
