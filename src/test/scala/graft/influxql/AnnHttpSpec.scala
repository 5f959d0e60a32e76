package graft.influxql

import java.net.{HttpURLConnection, URI}

import graft.SparkTestBase

/** End-to-end lifecycle of the ANN front door (r11, VERDICT r10 #4):
  * `/ann/write`-append → daemon tick (bootstrap/fold) → `/ann/query`
  * returns the probed-cell top-k — the full consumer path a user drives
  * without touching VectorIndexStore directly.
  */
class AnnHttpSpec extends SparkTestBase {

  private def call(port: Int, method: String, path: String,
      body: Option[String] = None): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes("UTF-8"))
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, out)
  }

  /** vec i: direction e_{i%4} in 8-dim plus a UNIQUE per-id nudge on a
    * disjoint dimension (4 + i%4) — group structure, and no two corpus
    * vectors are equal, so an exact self-match is unambiguous. */
  private def vec(i: Int): Seq[Double] =
    (0 until 8).map { d =>
      if (d == i % 4) 1.0
      else if (d == 4 + i % 4) 1e-4 * i
      else 0.0
    }

  private def lines(ids: Range): String =
    ids.map(i => s"$i ${vec(i).mkString(",")}").mkString("\n")

  private def pollUntil(deadlineMs: Long)(f: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    var ok = f
    while (!ok && System.currentTimeMillis() < end) { Thread.sleep(500); ok = f }
    ok
  }

  test("append -> tick bootstrap -> query serves probed-cell top-k; delta folds on the next tick") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann").toFile
    val h = InfluxQLHttp.startStore(spark, store.toString, cqTickSec = Some(1))
    try {
      // vectors land in delta with NO index work; query 503s until a tick builds
      assert(call(h.port, "POST", "/ann/write", Some(lines(0 until 100)))._1 == 204)
      val (preCode, preBody) = call(h.port, "GET", "/ann/query?probe=1,0,0,0,0,0,0,0")
      assert(preCode == 503 || preCode == 200, preBody) // 200 only if the 1s tick already fired
      if (preCode == 503) assert(preBody.contains("not built"), preBody)

      // the daemon tick bootstraps the index from the delta
      val probe = vec(42).mkString(",")
      assert(pollUntil(90000)(call(h.port, "GET", s"/ann/query?probe=$probe&k=5")._1 == 200),
        "index never became queryable")
      val (c1, b1) = call(h.port, "GET", s"/ann/query?probe=$probe&k=5&nprobe=1")
      assert(c1 == 200, b1)
      // exact self-match: vec 42 is in the corpus, its quantized twin
      // lands in the same cell the probe selects — top hit even at nprobe=1
      assert(b1.contains("\"vec_id\":42"), b1)
      assert(b1.replaceAll(".*\"stale\":", "").replaceAll("[^0-9].*", "") == "0", b1)

      // a fresh append is visible as staleness, then folds on the next tick
      val donor = s"9999 ${vec(42).mkString(",")}"
      assert(call(h.port, "POST", "/ann/write", Some(donor))._1 == 204)
      assert(pollUntil(90000) {
        val (c, b) = call(h.port, "GET", s"/ann/query?probe=$probe&k=2&nprobe=1")
        c == 200 && b.contains("\"vec_id\":9999") && b.contains("\"stale\":0")
      }, "appended vector never became searchable")
    } finally h.stop()
  }

  test("both ANN endpoints are auth-gated; index mutation requires admin") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann-auth").toFile
    val h = InfluxQLHttp.startStore(spark, store.toString,
      auth = Some(("root", "secret")))
    try {
      assert(call(h.port, "POST", "/ann/write", Some("1 1,0"))._1 == 401)
      assert(call(h.port, "GET", "/ann/query?probe=1,0")._1 == 401)
      // authenticated admin passes (503: nothing built yet, but authorized)
      assert(call(h.port, "POST", "/ann/write?u=root&p=secret", Some("1 1,0"))._1 == 204)
      assert(call(h.port, "GET", "/ann/query?probe=1,0&u=root&p=secret")._1 == 503)
      // malformed bodies are 400s, not 500s
      assert(call(h.port, "POST", "/ann/write?u=root&p=secret", Some("nope"))._1 == 400)
      assert(call(h.port, "POST", "/ann/write?u=root&p=secret",
        Some("1 1,0\n2 1,0,0"))._1 == 400)
    } finally h.stop()
  }

  test("malformed numeric /ann/query params are 400 client errors, not 500s (ADVICE r11)") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann-400").toFile
    val h = InfluxQLHttp.startStore(spark, store.toString)
    try {
      for (q <- Seq(
          "/ann/query?probe=1,x,3",          // non-numeric probe component
          "/ann/query?probe=1,0&k=abc",      // non-integer k
          "/ann/query?probe=1,0&nprobe=",    // empty nprobe
          "/ann/query?probe=1,0&k=2.5",      // fractional k
          "/ann/query?probe=NaN,0",          // non-finite probe
          "/ann/query?probe=")) {            // empty probe vector
        val (code, body) = call(h.port, "GET", q)
        assert(code == 400, s"$q -> $code $body")
      }
    } finally h.stop()
  }

  test("POST /ann/query answers a probe batch in one plan; malformed batches 400 (r12)") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann-batch").toFile
    val h = InfluxQLHttp.startStore(spark, store.toString, cqTickSec = Some(1))
    try {
      assert(call(h.port, "POST", "/ann/write", Some(lines(0 until 100)))._1 == 204)
      assert(pollUntil(90000)(
        call(h.port, "GET", s"/ann/query?probe=${vec(1).mkString(",")}")._1 == 200),
        "index never became queryable")
      // three probes, one POST: each probe's self-match tops its hit list
      val batch = Seq(11, 22, 33).map(i => s"$i ${vec(i).mkString(",")}").mkString("\n")
      val (code, body) = call(h.port, "POST", "/ann/query?k=3&nprobe=2", Some(batch))
      assert(code == 200, body)
      for (pid <- Seq(11, 22, 33)) {
        val section = body.split(s""""probe_id":$pid""")(1).split("}]")(0)
        assert(section.contains(s""""vec_id":$pid"""),
          s"probe $pid must self-match in its own hit list: $section")
      }
      assert(body.contains("\"stale\":"), body)
      // malformed lines / dims / params are client errors
      assert(call(h.port, "POST", "/ann/query", Some("nope"))._1 == 400)
      assert(call(h.port, "POST", "/ann/query", Some("1 1,0,0"))._1 == 400) // wrong dim
      assert(call(h.port, "POST", "/ann/query?k=abc", Some("1 " +
        vec(1).mkString(",")))._1 == 400)
      assert(call(h.port, "POST", "/ann/query", Some(""))._1 == 400)
    } finally h.stop()
  }

  test("GraftSession.annSearch registers the SQL view over a store index") {
    import org.apache.spark.sql.functions.col
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-sql").toFile
    val sq = spark; import sq.implicits._
    val corpus = (0 until 64).map(i => (i.toLong, vec(i).map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    graft.sinks.VectorIndexStore.build(spark, corpus, idx.getPath)
    val df = graft.GraftSession.annSearch(spark, idx.getPath, vec(7), topK = 3)
    val viaSql = spark.sql("SELECT vec_id, score FROM ann_search ORDER BY score DESC")
      .collect()
    assert(viaSql.length == 3 && viaSql.head.getLong(0) == 7L)
    assert(df.orderBy(col("score").desc).head().getLong(0) == 7L)
  }
}
