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
      // drain: keep ticking until every appended vector is folded in.
      // staleCount==0 alone is NOT drained anymore (r12): a retrain-in-
      // flight holds vectors in delta.folding while delta reads empty —
      // wait for full quiescence (no delta, no marker, no .building).
      val idx = InfluxQLHttp.annIndexDir(store)
      val deadline = System.currentTimeMillis() + 120000
      var quiet = false
      while (!quiet && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000)
        quiet = graft.sinks.VectorIndexStore.quiesced(idx) &&
          graft.sinks.VectorIndexStore.staleCount(spark, idx) == 0L
      }
      stopReaders.set(true); readers.foreach(_.join(10000))
      assert(quiet, "delta never drained")
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

  /** One request's observed lifecycle during the concurrency probe. */
  private case class Obs(endpoint: String, startMs: Long, endMs: Long, code: Int)

  test("a retrain-scale index build does not freeze /query, /write or /ann/query (r12, VERDICT r11 #1)") {
    // Pre-fix, the daemon tick held the store's global write lock across
    // the FULL IVF build, so every request issued during the build
    // completed only AFTER it (the fair lock queues readers behind the
    // waiting writer). The assertion that kills that regression: requests
    // COMPLETE INSIDE the build window, with latency far below the build
    // duration.
    val store = java.nio.file.Files.createTempDirectory("graft-ann-freeze").toString
    val idx = InfluxQLHttp.annIndexDir(store)
    val dim = 48
    val n = 40000L
    import org.apache.spark.sql.functions._
    // deterministic non-trivial corpus straight into delta via the
    // single-writer lifecycle path (POSTing 40k vectors would dominate
    // the test); the first daemon tick then runs the full bootstrap build
    val emb = spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), d -> cast(sin(id * (d + 1)) AS float))")
        .as("embedding"))
    graft.sinks.VectorIndexStore.append(spark, emb, idx)
    graft.sinks.VectorIndexStore.checkDim(idx, dim)
    val h = InfluxQLHttp.startStore(spark, store, cqTickSec = Some(1L))
    try {
      val port = h.port
      // one point so /query has a real (cheap) measurement to plan
      assert(http(port, "POST", "/write?db=plc",
        Some("m,alias=a value=1.0 1704067200000000000")) == 204)
      val listsDir = new java.io.File(s"$idx/lists")
      val obs = new java.util.concurrent.ConcurrentLinkedQueue[Obs]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val probeQ = (0 until dim).map(d => math.sin(17.0 * (d + 1))).mkString(",")
      def hammer(endpoint: String, fire: () => Int): Thread =
        new Thread(() => while (!stop.get()) {
          val t0 = System.currentTimeMillis()
          val c = fire()
          obs.add(Obs(endpoint, t0, System.currentTimeMillis(), c)): Unit
          Thread.sleep(100)
        })
      val threads = Seq(
        hammer("query", () => http(port, "GET",
          "/query?db=plc&q=" + java.net.URLEncoder.encode(
            "SELECT COUNT(value) FROM m", "UTF-8"), None)),
        hammer("write", () => http(port, "POST", "/write?db=plc",
          Some(s"m,alias=b value=2.0 ${1704067200000000000L + obs.size * 1000000L}"))),
        hammer("ann", () => http(port, "GET",
          s"/ann/query?probe=$probeQ&k=3&nprobe=2", None)))
      val tStart = System.currentTimeMillis()
      threads.foreach(_.start())
      // the build window closes when the commit swap publishes lists/
      val deadline = tStart + 240000L
      while (!listsDir.exists() && System.currentTimeMillis() < deadline)
        Thread.sleep(25)
      val tBuilt = System.currentTimeMillis()
      stop.set(true); threads.foreach(_.join(15000))
      assert(listsDir.exists(), "index never built within 240s")
      val buildMs = tBuilt - tStart
      // the window must be long enough that "completed during the build"
      // is meaningful — if hardware ever makes this build sub-3s, grow n
      assert(buildMs >= 3000L,
        s"build finished in ${buildMs}ms — corpus too small to observe concurrency")
      import scala.jdk.CollectionConverters._
      val all = obs.asScala.toSeq
      // no 5xx anywhere; /ann/query may legitimately 503 pre-build
      val bad = all.filter(o => o.code >= 500 && o.code != 503)
      assert(bad.isEmpty, s"5xx during build: $bad")
      // the teeth: each endpoint COMPLETED requests strictly inside the
      // build window (pre-fix they all queued until tBuilt), with latency
      // a small fraction of the build duration
      val margin = math.min(1000L, buildMs / 4)
      for (ep <- Seq("query", "write", "ann")) {
        val during = all.filter(o =>
          o.endpoint == ep && o.startMs > tStart && o.endMs < tBuilt - margin)
        assert(during.size >= 3,
          s"$ep: only ${during.size} requests completed inside the ${buildMs}ms build window")
        val worst = during.map(o => o.endMs - o.startMs).max
        assert(worst < math.max(5000L, buildMs / 2),
          s"$ep: worst in-build latency ${worst}ms vs build ${buildMs}ms")
      }
      // post-build: the index serves and the generation marker advanced
      assert(graft.sinks.VectorIndexStore.generation(idx) >= 1L)
      assert(http(port, "GET", s"/ann/query?probe=$probeQ&k=3&nprobe=2", None) == 200)
    } finally h.stop()
  }
}
