package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

/** r10: the stateful pipelines run unchanged on the RocksDB state store —
  * the at-scale provider (per-series state at 10⁸ series does not fit the
  * default in-memory HDFSBackedStateStore; RocksDB spills to local disk
  * and checkpoints to the same durable location). The provider is pure
  * configuration: `spark.sql.streaming.stateStore.providerClass=
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
  * This spec pins result-equality with the default provider on the CUSUM
  * pipeline, cross-micro-batch (state round-trips through RocksDB).
  */
class RocksDBStateSpec extends SparkTestBase {

  private def ts(sec: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(sec.toLong))

  test("CUSUM alarms are identical under the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val evs = (0 until 300).map(i =>
      Ev(i.toLong, ts(i), (i % 3).toLong, "m", 40.0 + rnd.nextInt(60)))

    def run(name: String, provider: Option[String]): List[CusumAlarm] = {
      provider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      try {
        val ms = MemoryStream[Ev]
        val q = Pipelines.cusumAlerts(ms.toDF())
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        evs.grouped(100).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
        q.stop()
        spark.table(name).as[CusumAlarm].collect().toList.sortBy(_.event_id)
      } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }

    val rocks = run("cusum_rocks", Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val dflt = run("cusum_dflt", None)
    assert(rocks.nonEmpty, "expected alarms from the drifting series")
    assert(rocks === dflt, "providers must agree row-for-row")
  }

  test("r13 sketch monitors (T22 hist, T23 AMS) are identical under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(37)
    val rows = (0 until 3000).map(i => ("m" + (i % 3), rnd.nextInt(5000) * 1.0))
    val ids = (0 until 3000).map(i => ("m" + (i % 3), rnd.nextInt(200).toLong))

    def run[T](name: String, provider: Option[String])(
        mk: String => org.apache.spark.sql.Dataset[T]): Seq[String] = {
      provider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      try {
        val ds = mk(name)
        spark.table(name).collect().map(_.toString).toSeq.sorted
      } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rocksP = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

    def histRun(name: String): org.apache.spark.sql.Dataset[HistQuantileEstimate] = {
      val ms = MemoryStream[(String, Double)]
      val out = Pipelines.histQuantileMonitor(ms.toDF().toDF("event_type", "value"))
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      rows.grouped(1000).foreach { c => ms.addData(c); q.processAllAvailable() }
      q.stop(); out
    }
    def amsRun(name: String): org.apache.spark.sql.Dataset[AmsF2Estimate] = {
      val ms = MemoryStream[(String, Long)]
      val out = Pipelines.amsMonitor(ms.toDF().toDF("event_type", "user_id"))
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      ids.grouped(1000).foreach { c => ms.addData(c); q.processAllAvailable() }
      q.stop(); out
    }

    assert(run("hist_rocks", Some(rocksP))(histRun) === run("hist_dflt", None)(histRun),
      "hist monitor must agree across providers")
    assert(run("ams_rocks", Some(rocksP))(amsRun) === run("ams_dflt", None)(amsRun),
      "AMS monitor must agree across providers")
  }
}
