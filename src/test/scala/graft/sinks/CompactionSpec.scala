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
}
