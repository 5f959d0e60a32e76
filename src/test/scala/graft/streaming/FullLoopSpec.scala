package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.influxql.{InfluxQLPlanner, InfluxQLResult}
import graft.queries.QCustom

import java.nio.file.Files

/** The ENTIRE reference system in one test (SURVEY §3): XML tag catalog →
  * simulated S7 device source → native DecodeS7 → broadcast config
  * enrichment → partitioned point store → InfluxQL query → InfluxDB-wire
  * JSON — i.e. what a user of the reference actually runs, poll to
  * Grafana panel, with every stage the Spark-native implementation.
  */
class FullLoopSpec extends SparkTestBase {

  test("poll -> decode -> store -> InfluxQL -> Grafana JSON, one loop") {
    val store = Files.createTempDirectory("fullloop_store").toString
    val ckpt = Files.createTempDirectory("fullloop_ckpt").toString

    // ingest the reference dataflow into the queryable store
    val q = Pipelines.ingestToStore(spark, QCustom.SampleConfigXml, store, ckpt)
    q.awaitTermination(120000)

    // the store discovered the configured PLCs as measurements
    val measurements = InfluxQLPlanner.sqlStore(spark, store, "SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSeq
    assert(measurements == Seq("10.0.0.1", "10.0.0.2", "10.0.0.3"))

    // tag values are the CONFIG aliases (enrichment applied), inactive dropped
    val aliases = InfluxQLPlanner.sqlStore(spark, store,
      """SHOW TAG VALUES FROM "10.0.0.1" WITH KEY = alias""")
      .collect().map(_.getString(1)).toSeq
    assert(aliases.nonEmpty && aliases.forall(_.startsWith("plc1_")))
    assert(!aliases.exists(_.contains("_mode")), "inactive tags must not reach the store")

    // a Grafana-shaped query over the ingested points
    val meanDf = InfluxQLPlanner.sqlStore(spark, store,
      """SELECT MEAN(value) AS m, COUNT(value) AS n FROM "10.0.0.1" GROUP BY alias""")
    val rows = meanDf.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(2) > 0))
    // matches the direct computation over the store files
    val direct = spark.read.parquet(s"$store/measurement=10.0.0.1")
      .groupBy("alias").agg(round(avg("value"), 4).as("m"), count("value").as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == direct)

    // and the wire format a Grafana datasource would parse
    val json = InfluxQLResult.render(spark, store,
      """SELECT MEAN(value) AS m FROM "10.0.0.1" GROUP BY alias""",
      catalog = InfluxQLPlanner.Catalog.store(store))
    val root = new ObjectMapper().readTree(json)
    val series = root.at("/results/0/series")
    assert(series.size() == rows.length)
    assert(series.get(0).at("/name").asText() == "10.0.0.1")
    assert(series.get(0).at("/tags/alias").asText().startsWith("plc1_"))

    // the same panel query over the REAL wire: a served /query against the
    // ingested store returns the identical series (what a Grafana
    // datasource pointed at this process would receive)
    val h = graft.influxql.InfluxQLHttp.startStore(spark, store)
    try {
      val conn = new java.net.URI(s"http://127.0.0.1:${h.port}/query?db=plc&q=" +
        java.net.URLEncoder.encode(
          """SELECT MEAN(value) AS m FROM "10.0.0.1" GROUP BY alias""", "UTF-8"))
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val served = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      conn.disconnect()
      assert(new ObjectMapper().readTree(served) == root,
        "served JSON must equal the in-process render")
    } finally h.stop()

    // retention against the same store (sim data is dated 2024-01-01;
    // `today` pinned for determinism): a 30d policy keeps it, then a 1d
    // policy a month later expires the whole date partition — no rewrite
    val kept = InfluxQLPlanner.applyRetention(
      "CREATE RETENTION POLICY keep ON plc DURATION 30d REPLICATION 1",
      store, today = java.time.LocalDate.parse("2024-01-02"))
    assert(kept.isEmpty)
    val removed = InfluxQLPlanner.applyRetention(
      "CREATE RETENTION POLICY expire ON plc DURATION 1d REPLICATION 1",
      store, today = java.time.LocalDate.parse("2024-02-01"))
    assert(removed.size == 3 && removed.forall(_.contains("date=2024-01-01")))
    assert(InfluxQLPlanner.sqlStore(spark, store,
      """SELECT COUNT(value) AS n FROM "10.0.0.1"""").collect().head.getLong(0) == 0)
  }

  test("reference topology: daemon /write -> CQ rollup tick -> subscription mirror -> query both nodes") {
    // The full deployment the reference README describes, with every
    // moving part this engine's own: a daemon POSTing line protocol to
    // the primary node, the co-located CQ scheduler materializing the
    // standing rollup, a subscription mirroring accepted writes to a
    // second node (the Kapacitor topology), and Grafana-shape /query
    // panels against both.
    import java.net.{HttpURLConnection, URI, URLEncoder}
    val primary = Files.createTempDirectory("fullloop_primary").toString
    val mirror = Files.createTempDirectory("fullloop_mirror").toString
    // clock pinned past the data so the first CQ tick finalizes all buckets
    val nowNs = java.sql.Timestamp.valueOf("2024-01-01 00:10:00").getTime * 1000000L
    val hm = graft.influxql.InfluxQLHttp.startStore(spark, mirror)
    val hp = graft.influxql.InfluxQLHttp.startStore(spark, primary,
      nowNs = Some(nowNs), cqTickSec = Some(1L))
    try {
      def postQuery(port: Int, q: String): (Int, String) = {
        val conn = new URI(s"http://127.0.0.1:$port/query").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST"); conn.setDoOutput(true)
        conn.getOutputStream.write(
          s"q=${URLEncoder.encode(q, "UTF-8")}".getBytes("UTF-8"))
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = if (is == null) "" else new String(is.readAllBytes(), "UTF-8")
        conn.disconnect(); (code, body)
      }
      // polling-tolerant: a 400 (measurement not yet materialized /
      // forwarded) reads as an empty series list, not a failure
      def getSeries(port: Int, q: String): com.fasterxml.jackson.databind.JsonNode = {
        val conn = new URI(s"http://127.0.0.1:$port/query?db=plc&q=" +
          URLEncoder.encode(q, "UTF-8")).toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        val code = conn.getResponseCode
        if (code != 200) {
          Option(conn.getErrorStream).foreach(_.readAllBytes())
          conn.disconnect()
          return new ObjectMapper().createArrayNode()
        }
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        conn.disconnect()
        new ObjectMapper().readTree(body).at("/results/0/series")
      }
      // provision the topology over the wire, exactly as an admin would
      assert(postQuery(hp.port,
        "CREATE DATABASE plc; " +
          s"CREATE SUBSCRIPTION mirror0 ON plc.autogen DESTINATIONS ALL 'http://127.0.0.1:${hm.port}'; " +
          "CREATE CONTINUOUS QUERY roll1m ON plc BEGIN " +
          "SELECT MEAN(value) AS m INTO plc7_1m FROM plc7 GROUP BY time(1m), alias END")._1 == 200)
      // the daemon's steady-state loop: line-protocol POSTs per sample
      val wc = new URI(s"http://127.0.0.1:${hp.port}/write?db=plc").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      wc.setRequestMethod("POST"); wc.setDoOutput(true)
      val t0 = 1704067200000000000L // 2024-01-01T00:00:00Z
      wc.getOutputStream.write((
        s"plc7,alias=temp value=20.0 $t0\n" +
          s"plc7,alias=temp value=22.0 ${t0 + 30000000000L}\n" + // 00:00:30
          s"plc7,alias=temp value=30.0 ${t0 + 65000000000L}\n" + // 00:01:05
          s"plc7,alias=rpm value=900.0 ${t0 + 10000000000L}").getBytes("UTF-8"))
      assert(wc.getResponseCode == 204); wc.disconnect()

      // the CQ tick (1s cadence) materializes the rollup in the primary
      val deadline = System.currentTimeMillis() + 30000
      var rollup = Map.empty[(String, String), Double]
      while (rollup.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val s = getSeries(hp.port,
          "SELECT value FROM plc7_1m WHERE alias = 'temp' ORDER BY time")
        if (s.size() > 0) {
          val vs = s.get(0).at("/values")
          rollup = (0 until vs.size()).map(i =>
            (vs.get(i).get(0).asText(), "temp") -> vs.get(i).get(1).asDouble()).toMap
        }
      }
      assert(rollup == Map(
        ("2024-01-01T00:00:00Z", "temp") -> 21.0,
        ("2024-01-01T00:01:00Z", "temp") -> 30.0), rollup)

      // the subscription mirrored the RAW writes to the second node —
      // a Grafana panel against the mirror sees the same samples
      val mDeadline = System.currentTimeMillis() + 20000
      var mirrored = 0L
      while (mirrored < 4L && System.currentTimeMillis() < mDeadline) {
        Thread.sleep(300)
        val s = getSeries(hm.port, "SELECT COUNT(value) AS n FROM plc7")
        if (s.size() > 0) mirrored = s.get(0).at("/values/0/0").asLong()
      }
      assert(mirrored == 4L, s"mirror received $mirrored of 4 points")
      val mMean = getSeries(hm.port,
        "SELECT MEAN(value) AS m FROM plc7 WHERE alias = 'temp'")
        .get(0).at("/values/0/0").asDouble()
      assert(mMean == 24.0) // (20+22+30)/3 — identical data on both nodes
    } finally { hp.stop(); hm.stop() }
  }
}
