package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T23: the streaming AMS F2 monitor reproduces the batch q_ams_f2
  * estimate exactly — sign sums are order-independent integer additions,
  * so the terminal per-group estimate after several micro-batches is
  * bit-equal to the batch key over the same rows regardless of batch
  * boundaries — and state stays 96 longs per group no matter how many
  * distinct keys stream through.
  */
class AmsStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("multi-batch terminal estimate matches the batch q_ams_f2 bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.tables.Tables.events(spark, dir)
      .select("user_id").as[Long].collect().toSeq.map(("events", _))
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.amsMonitor(ms.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("ams_out").outputMode("append").start()
    rows.grouped(math.max(1, rows.size / 4 + 1)).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val terminal = spark.table("ams_out").as[AmsF2Estimate].collect().maxBy(_.n_rows)
    // the last emitted estimate is always current (emit-on-change at
    // minRelDelta=0 withholds only no-change batches)
    assert(terminal.n_rows <= rows.size.toLong)
    val batch = graft.Registry.byName("q_ams_f2").run(spark, dir).head()
    val (exact, est) = (batch.getLong(0), batch.getLong(1))
    assert(terminal.f2_est === est,
      s"streamed ${terminal.f2_est} vs batch $est (exact $exact)")
  }

  test("emit gate: an estimate-preserving micro-batch emits nothing, growth emits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.amsMonitor(ms.toDF().toDF("event_type", "user_id"), minRelDelta = 0.5)
      .writeStream.format("memory").queryName("ams_band").outputMode("append").start()
    ms.addData((0 until 2000).map(i => ("m", (i % 40).toLong))); q.processAllAvailable()
    assert(spark.table("ams_band").count() === 1L) // first estimate always emits
    // one more row on 2000: F2 moves by ~0.1%, far inside the 50% band
    ms.addData(Seq(("m", 1L))); q.processAllAvailable()
    assert(spark.table("ams_band").count() === 1L,
      "a sub-band F2 move must not emit")
    // doubling every key's count quadruples F2 — way past the band
    ms.addData((0 until 2000).map(i => ("m", (i % 40).toLong))); q.processAllAvailable()
    assert(spark.table("ams_band").count() === 2L)
    q.stop()
  }
}
