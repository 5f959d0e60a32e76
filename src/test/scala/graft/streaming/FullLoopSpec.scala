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
}
