package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

/** T18: the streaming MACD pipeline reproduces the batch fold exactly —
  * per-series crossing counts match [[graft.functions.Macd.macdByKey]]
  * across micro-batch boundaries, and every emitted crossing row carries
  * the state an independent driver-side replay of the recurrence computes
  * at that sample.
  */
class MacdStreamSpec extends SparkTestBase {

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  /** Independent replay: the T18 recurrence folded locally, returning the
    * (event_id, macd, signal, histogram) rows at each sign flip. */
  private def replay(evs: Seq[Ev]): Map[Long, Seq[(Long, Double, Double)]] = {
    import graft.functions.Macd.{AlphaFast, AlphaSlow, AlphaSig}
    evs.groupBy(_.user_id).map { case (uid, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      var ef = 0.0; var esl = 0.0; var m = 0.0; var sg = 0.0; var n = 0L
      val out = sorted.flatMap { e =>
        if (n == 0L) { ef = e.value; esl = e.value; n = 1; None }
        else {
          ef += AlphaFast * (e.value - ef)
          esl += AlphaSlow * (e.value - esl)
          val m2 = ef - esl
          val sg2 = sg + AlphaSig * (m2 - sg)
          val crossed = (m2 - sg2) * (m - sg) < 0
          m = m2; sg = sg2; n += 1
          if (crossed) Some((e.event_id, m, sg)) else None
        }
      }
      uid -> out
    }
  }

  test("multi-batch crossings match the batch fold and the driver replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(11)
    // oscillating series → plenty of histogram sign flips
    val evs = (0 until 300).map { i =>
      Ev(i.toLong, ts(i), (i % 3).toLong, "m",
        50.0 + 30.0 * math.sin(i / 7.0) + rnd.nextInt(10))
    }
    val ms = MemoryStream[Ev]
    val q = Pipelines.macdCrossings(ms.toDF())
      .writeStream.format("memory").queryName("macd_out").outputMode("append").start()
    // three micro-batches: state must carry (ef, es, m, sg) across each boundary
    evs.grouped(110).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("macd_out").as[MacdCross].collect().toSeq
    assert(streamed.nonEmpty, "the oscillating series must produce crossings")

    // 1. per-series crossing counts == the batch fold's `crossings`
    val batch = graft.functions.Macd.macdByKey(
        evs.map(e => (e.user_id, e.ts.getTime * 1000000L, e.event_id, e.value))
          .toDF("user_id", "ts_ns", "event_id", "value"))
      .collect().map(r => r.user_id -> r.crossings).toMap
    val perSeries = streamed.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    (0L until 3L).foreach { uid =>
      assert(perSeries.getOrElse(uid, 0L) === batch(uid),
        s"series $uid: streamed ${perSeries.getOrElse(uid, 0L)} vs batch ${batch(uid)}")
    }

    // 2. every emitted row's state == the independent replay at that sample
    val expect = replay(evs)
    streamed.groupBy(_.user_id).foreach { case (uid, rows) =>
      val got = rows.sortBy(_.event_id).map(r => (r.event_id, r.macd, r.signal_line))
      assert(got === expect(uid), s"series $uid crossing rows diverge from replay")
    }
  }

  test("a series whose batches each contain a single sample still folds in order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // hand-picked to cross: up-trend then sharp reversal
    val vals = Seq(50.0, 60.0, 70.0, 80.0, 20.0, 10.0, 5.0, 90.0, 95.0)
    val evs = vals.zipWithIndex.map { case (v, i) => Ev(i.toLong, ts(i), 1L, "m", v) }
    val ms = MemoryStream[Ev]
    val q = Pipelines.macdCrossings(ms.toDF())
      .writeStream.format("memory").queryName("macd_out2").outputMode("append").start()
    evs.foreach { e => ms.addData(e); q.processAllAvailable() } // one sample per batch
    q.stop()
    val streamed = spark.table("macd_out2").as[MacdCross].collect().toSeq
      .sortBy(_.event_id).map(r => (r.event_id, r.macd, r.signal_line))
    assert(streamed === replay(evs)(1L))
    val batch = graft.functions.Macd.macdByKey(
        evs.map(e => (e.user_id, e.ts.getTime * 1000000L, e.event_id, e.value))
          .toDF("user_id", "ts_ns", "event_id", "value")).collect().head
    assert(streamed.size.toLong === batch.crossings)
  }
}
