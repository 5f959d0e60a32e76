package graft.influxql

import graft.SparkTestBase

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.util.concurrent.atomic.AtomicInteger

/** Whole-node chaos: writers, readers, and an admin churning retention
  * policies and continuous queries all race the live daemon tick on one
  * store. The reference topology runs exactly this mix (Telegraf-style
  * POSTs + Grafana polls + operator admin) against one influxd; the
  * contract under test is the store's RW-lock discipline — appends and
  * reads on the shared side, compaction swaps and admin mutations on the
  * exclusive side — with zero lost points, zero failed requests, and a
  * bounded file count at the end.
  */
class ServeChaosSpec extends SparkTestBase {

  private def http(port: Int, method: String, path: String, body: Option[String]): Int = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val c = conn.getResponseCode
    // drain so keep-alive sockets recycle
    try { val s = if (c < 400) conn.getInputStream else conn.getErrorStream
      if (s != null) { while (s.read() != -1) {}; s.close() } } catch { case _: Exception => }
    conn.disconnect(); c
  }

  test("writers + readers + admin churn race the daemon tick with zero losses") {
    val store = java.nio.file.Files.createTempDirectory("graft-chaos").toString
    val h = InfluxQLHttp.startStore(spark, store, cqTickSec = Some(1L))
    try {
      val port = h.port
      def q(s: String) = "/query?db=plc&q=" + URLEncoder.encode(s, "UTF-8")
      val t0 = 1704067200000000000L
      val nWriters = 6; val perWriter = 40
      val badWrites = new AtomicInteger(0)
      val badReads = new AtomicInteger(0)
      val badAdmin = new AtomicInteger(0)
      val stopReaders = new java.util.concurrent.atomic.AtomicBoolean(false)

      val writers = (0 until nWriters).map { t =>
        new Thread(() => (0 until perWriter).foreach { i =>
          val seq = t * perWriter + i
          if (http(port, "POST", "/write?db=plc",
              Some(s"chaos,alias=w$t value=$seq.0 ${t0 + seq * 1000000L}")) != 204)
            badWrites.incrementAndGet(): Unit
        })
      }
      val readers = (0 until 3).map { _ =>
        new Thread(() => while (!stopReaders.get()) {
          // a point-count scan and a metadata listing, both on the shared side
          if (http(port, "GET", q("SELECT COUNT(value) FROM chaos"), None) >= 500)
            badReads.incrementAndGet()
          if (http(port, "GET", q("SHOW MEASUREMENTS"), None) >= 500)
            badReads.incrementAndGet(): Unit
        })
      }
      val admin = new Thread(() => (0 until 10).foreach { i =>
        // retention + CQ lifecycle churn — exclusive-side mutations racing
        // the shared-side traffic and the compaction tick
        Seq(
          s"CREATE RETENTION POLICY rp$i ON plc DURATION 52w REPLICATION 1",
          s"""CREATE CONTINUOUS QUERY cq$i ON plc BEGIN
             |SELECT MEAN(value) INTO rollup$i FROM chaos GROUP BY time(1h) END""".stripMargin,
          s"DROP CONTINUOUS QUERY cq$i ON plc",
          s"DROP RETENTION POLICY rp$i ON plc"
        ).foreach { stmt =>
          if (http(port, "POST", q(stmt), None) >= 500) badAdmin.incrementAndGet(): Unit
        }
      })

      // the target db must exist before the mixed load starts
      assert(http(port, "POST", q("CREATE DATABASE plc"), None) == 200)
      readers.foreach(_.start()); admin.start(); writers.foreach(_.start())
      writers.foreach(_.join()); admin.join()
      stopReaders.set(true); readers.foreach(_.join())

      assert(badWrites.get() == 0, s"${badWrites.get()} writes failed under chaos")
      assert(badReads.get() == 0, s"${badReads.get()} reads 5xx'd under chaos")
      assert(badAdmin.get() == 0, s"${badAdmin.get()} admin statements 5xx'd under chaos")
      // zero lost, zero duplicated, compaction still bounded the files
      val rows = InfluxQLPlanner.sqlStore(spark, store,
        "SELECT COUNT(value) AS n, COUNT(DISTINCT value) AS d FROM chaos").collect().head
      assert(rows.getLong(0) == (nWriters * perWriter).toLong,
        s"expected ${nWriters * perWriter} points, got ${rows.getLong(0)}")
      assert(rows.getLong(1) == (nWriters * perWriter).toLong, "duplicated points")
      val part = new java.io.File(store, "measurement=chaos/date=2024-01-01")
      val deadline = System.currentTimeMillis() + 30000
      def files() = Option(part.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
      while (files() > 32 && System.currentTimeMillis() < deadline) Thread.sleep(300)
      assert(files() <= 32, s"compaction fell behind: ${files()} files")
    } finally h.stop()
  }
}
