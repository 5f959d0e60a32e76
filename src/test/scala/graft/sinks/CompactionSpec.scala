package graft.sinks

import graft.SparkTestBase

/** The small-file compactor behind the direct-append `/write` design:
  * one file per POST makes the ack fast but accumulates (a 1 Hz daemon =
  * ~86k files/day/partition) — `PointStoreDirect.compact` is the
  * InfluxDB-background-compactor analogue that folds them away without
  * rewriting cold history.
  */
class CompactionSpec extends SparkTestBase {

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
      case f if f.isDirectory => parquetFiles(f)
      case f if f.getName.endsWith(".parquet") => Seq(f)
      case _ => Seq.empty
    }

  test("compact folds many per-POST files into few, preserving data; cold partitions untouched") {
    val store = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val day0 = 1704067200000000000L // 2024-01-01T00:00:00Z
    // hot partition: 50 direct appends (one file each, the per-POST shape)
    (0 until 50).foreach { i =>
      PointStoreDirect.append(Seq(
        PointStoreDirect.Point(day0 + i * 1000000000L, "plc1", "t", i.toDouble)), store)
    }
    // cold partition: a different day, few files
    PointStoreDirect.append(Seq(
      PointStoreDirect.Point(day0 + 86400L * 1000000000L, "plc1", "t", 999.0)), store)

    val hot = new java.io.File(store, "measurement=plc1/date=2024-01-01")
    val cold = new java.io.File(store, "measurement=plc1/date=2024-01-02")
    assert(parquetFiles(hot).size == 50)
    val coldBefore = parquetFiles(cold).map(f => (f.getName, f.lastModified()))

    val before = spark.read.parquet(s"$store/measurement=plc1")
      .select("ts", "alias", "value").collect().map(_.toSeq).toSet
    val compacted = PointStoreDirect.compact(spark, store, maxFiles = 16)
    assert(compacted.map(new java.io.File(_).getName) == Seq("date=2024-01-01"))
    assert(parquetFiles(hot).size < 16, s"still ${parquetFiles(hot).size} files")
    // cold history byte-untouched (same files, same mtimes)
    assert(parquetFiles(cold).map(f => (f.getName, f.lastModified())) == coldBefore)
    // data identical through the normal scan path
    val after = spark.read.parquet(s"$store/measurement=plc1")
      .select("ts", "alias", "value").collect().map(_.toSeq).toSet
    assert(after == before)
    // below threshold now → idempotent no-op
    assert(PointStoreDirect.compact(spark, store, maxFiles = 16).isEmpty)
  }

  test("the served store's daemon tick compacts live /write traffic") {
    import java.net.{HttpURLConnection, URI}
    val store = java.nio.file.Files.createTempDirectory("graft-compact-http").toString
    val h = graft.influxql.InfluxQLHttp.startStore(spark, store, cqTickSec = Some(1L))
    try {
      def post(body: String): Int = {
        val conn = new URI(s"http://127.0.0.1:${h.port}/write?db=plc").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        val c = conn.getResponseCode; conn.disconnect(); c
      }
      val t0 = 1704067200000000000L
      (0 until 40).foreach(i =>
        assert(post(s"plcc,alias=t value=$i.0 ${t0 + i * 1000000000L}") == 204))
      val part = new java.io.File(store, "measurement=plcc/date=2024-01-01")
      assert(parquetFiles(part).size == 40)
      // the daemon tick folds them; data stays queryable throughout
      val deadline = System.currentTimeMillis() + 30000
      while (parquetFiles(part).size > 32 && System.currentTimeMillis() < deadline)
        Thread.sleep(300)
      assert(parquetFiles(part).size <= 32, s"${parquetFiles(part).size} files")
      val n = graft.influxql.InfluxQLPlanner.sqlStore(spark, store,
        "SELECT COUNT(value) AS n FROM plcc").collect().head.getLong(0)
      assert(n == 40L)
    } finally h.stop()
  }

  test("compaction under churn: 8 writer threads race repeated compact ticks, zero points lost") {
    // r10 adversarial hardening (VERDICT r9 #7): CompactionSpec covered
    // fold + idempotence; this drives the REAL server — 8 concurrent
    // clients POSTing while the 1s daemon tick compacts the same
    // partition repeatedly — and then audits for lost/duplicated points
    // and a bounded file count. The lock contract under test: appends on
    // the shared side, compaction swaps under the exclusive side.
    import java.net.{HttpURLConnection, URI}
    val store = java.nio.file.Files.createTempDirectory("graft-compact-race").toString
    val h = graft.influxql.InfluxQLHttp.startStore(spark, store, cqTickSec = Some(1L))
    try {
      def post(body: String): Int = {
        val conn = new URI(s"http://127.0.0.1:${h.port}/write?db=plc").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        val c = conn.getResponseCode; conn.disconnect(); c
      }
      val t0 = 1704067200000000000L
      val nThreads = 8; val perThread = 60
      val failures = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until nThreads).map { t =>
        new Thread(() => (0 until perThread).foreach { i =>
          val seq = t * perThread + i
          // every point in ONE partition (same day) → maximal contention
          // between appends and the tick's compact-and-swap
          if (post(s"race,alias=w$t value=$seq.0 ${t0 + seq * 1000000L}") != 204)
            failures.incrementAndGet(): Unit
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(failures.get() == 0, s"${failures.get()} POSTs failed during churn")
      // let at least one more tick compact the tail
      val part = new java.io.File(store, "measurement=race/date=2024-01-01")
      val deadline = System.currentTimeMillis() + 30000
      while (parquetFiles(part).size > 32 && System.currentTimeMillis() < deadline)
        Thread.sleep(300)
      assert(parquetFiles(part).size <= 32,
        s"compaction fell behind: ${parquetFiles(part).size} files")
      // zero lost, zero duplicated: every (alias, seq) exactly once
      val rows = graft.influxql.InfluxQLPlanner.sqlStore(spark, store,
        "SELECT COUNT(value) AS n, COUNT(DISTINCT value) AS d FROM race").collect().head
      assert(rows.getLong(0) == (nThreads * perThread).toLong,
        s"expected ${nThreads * perThread} points, got ${rows.getLong(0)}")
      assert(rows.getLong(1) == (nThreads * perThread).toLong, "duplicated points after swap")
    } finally h.stop()
  }
}
