package graft.influxql

import graft.SparkTestBase

import java.net.{HttpURLConnection, URI}
import java.util.concurrent.atomic.AtomicInteger

/** Chaos for the ANN front door (r11): vector writers and ANN readers race
  * the daemon tick's index bootstrap/fold (plus the point-store /write
  * traffic sharing the same lock) — the ServeChaosSpec contract extended
  * to the new surface: zero 5xx anywhere, no vector ever lost (every
  * appended vec_id is searchable once the final tick drains the delta),
  * and queries during the staleness window serve the indexed corpus
  * instead of failing.
  */
class AnnChaosSpec extends SparkTestBase {

  private def http(port: Int, method: String, path: String,
      body: Option[String]): Int = httpB(port, method, path, body)._1

  private def httpB(port: Int, method: String, path: String,
      body: Option[String]): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val c = conn.getResponseCode
    val out = new StringBuilder
    try { val s = if (c < 400) conn.getInputStream else conn.getErrorStream
      if (s != null) {
        var b = s.read()
        while (b != -1) { if (out.length < 400) out.append(b.toChar); b = s.read() }
        s.close()
      } } catch { case _: Exception => }
    conn.disconnect(); (c, out.toString)
  }

  private def vec(i: Int): Seq[Double] =
    (0 until 8).map(d => if (d == i % 4) 1.0 else if (d == 4 + i % 4) 1e-4 * i else 0.0)

  test("vector writers + ANN readers + point writers race the tick: no 5xx, no lost vector") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann-chaos").toString
    val h = InfluxQLHttp.startStore(spark, store, cqTickSec = Some(1L))
    try {
      val port = h.port
      val bad = new AtomicInteger(0)
      val stopReaders = new java.util.concurrent.atomic.AtomicBoolean(false)
      val nWriters = 4; val perWriter = 25

      val vecWriters = (0 until nWriters).map { t =>
        new Thread(() => (0 until perWriter).foreach { i =>
          val id = t * perWriter + i
          val code = http(port, "POST", "/ann/write",
            Some(s"$id ${vec(id).mkString(",")}"))
          if (code != 204) {
            println(s"CHAOS-BAD ann/write id=$id code=$code")
            bad.incrementAndGet(): Unit
          }
        })
      }
      val pointWriters = (0 until 2).map { t =>
        new Thread(() => (0 until 30).foreach { i =>
          val wc = http(port, "POST", "/write?db=plc",
            Some(s"m,alias=p$t value=$i.0 ${1704067200000000000L + (t * 30 + i) * 1000000L}"))
          if (wc != 204) {
            println(s"CHAOS-BAD write t=$t i=$i code=$wc")
            bad.incrementAndGet(): Unit
          }
        })
      }
      val readers = (0 until 3).map { _ =>
        new Thread(() => while (!stopReaders.get()) {
          // 503 (not built yet) and 200 are both legal mid-chaos; 5xx is not
          val (c, b) = httpB(port, "GET",
            s"/ann/query?probe=${vec(7).mkString(",")}&k=3&nprobe=2", None)
          if (c != 200 && c != 503) {
            println(s"CHAOS-BAD ann/query code=$c body=$b")
            bad.incrementAndGet()
          }
          Thread.sleep(20)
        })
      }
      (vecWriters ++ pointWriters ++ readers).foreach(_.start())
      (vecWriters ++ pointWriters).foreach(_.join(120000))
      // drain: keep ticking until every appended vector is folded in
      val idx = InfluxQLHttp.annIndexDir(store)
      val deadline = System.currentTimeMillis() + 120000
      var stale = -1L
      while (stale != 0L && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000)
        stale = graft.sinks.VectorIndexStore.staleCount(spark, idx)
      }
      stopReaders.set(true); readers.foreach(_.join(10000))
      assert(stale === 0L, "delta never drained")
      assert(bad.get() === 0, s"${bad.get()} failed requests during chaos")
      // every written vector is in the folded lists exactly once
      val ids = spark.read.parquet(s"$idx/lists").select("vec_id").collect()
        .map(_.getLong(0)).sorted
      assert(ids.toSeq === (0L until (nWriters * perWriter).toLong),
        s"lost or duplicated vectors: ${ids.length} of ${nWriters * perWriter}")
      // and a self-probe finds its exact twin
      assert(http(port, "GET",
        s"/ann/query?probe=${vec(42).mkString(",")}&k=1&nprobe=3", None) == 200)
    } finally h.stop()
  }
}
