package graft.influxql

import java.sql.Timestamp

import graft.SparkTestBase

/** Field-name SELECTs over the point store (r9) — the standard
  * Grafana/Telegraf query shape (`SELECT MEAN("usage_idle") FROM cpu`):
  * a multi-field write explodes to one store point per field with the
  * field key in the `alias` tag, and the planner resolves field names
  * back through conditional projections. InfluxDB semantics throughout:
  * aggregates skip other fields' points, raw multi-field selects merge
  * back to one row per written point, unknown fields are EMPTY (not an
  * error).
  */
class FieldNameQuerySpec extends SparkTestBase {

  private def freshStore(): String = {
    val store = java.nio.file.Files.createTempDirectory("graft-fieldname").toString
    import spark.implicits._
    // the store shape a Telegraf-style multi-field write produces:
    // `cpu usage_idle=...,usage_user=... ts` exploded per field
    graft.sinks.PointStore.writePartitioned(
      Seq(
        (Timestamp.valueOf("2024-01-01 00:00:10"), "cpu", "usage_idle", 90.0),
        (Timestamp.valueOf("2024-01-01 00:00:10"), "cpu", "usage_user", 5.0),
        (Timestamp.valueOf("2024-01-01 00:00:40"), "cpu", "usage_idle", 80.0),
        (Timestamp.valueOf("2024-01-01 00:00:40"), "cpu", "usage_user", 15.0),
        (Timestamp.valueOf("2024-01-01 00:01:20"), "cpu", "usage_idle", 70.0))
        .toDF("ts", "measurement", "alias", "value"),
      store)
    store
  }

  test("aggregates over a named field skip other fields' points") {
    val store = freshStore()
    val rows = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(usage_idle) FROM cpu").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(80.0)) // (90+80+70)/3
    assert(rows.head.schema.fieldNames.head == "mean") // InfluxDB default name
    // two fields, one statement — independent conditional aggregates
    val both = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(usage_idle) AS i, SUM(usage_user) AS u, COUNT(usage_user) AS n FROM cpu")
      .collect().head
    assert((both.getDouble(0), both.getDouble(1), both.getLong(2)) == (80.0, 20.0, 2L))
    // bucketed (the Grafana panel shape)
    val bucketed = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(usage_idle) AS m FROM cpu " +
        "WHERE time >= '2024-01-01' AND time < '2024-01-02' GROUP BY time(1m)")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bucketed == Map(
      "2024-01-01 00:00:00" -> 85.0,
      "2024-01-01 00:01:00" -> 70.0))
  }

  test("raw multi-field select merges exploded rows back to one row per point") {
    val store = freshStore()
    val rows = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT usage_idle, usage_user FROM cpu ORDER BY time").collect()
    assert(rows.map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq == Seq(
      ("2024-01-01 00:00:10", Some(90.0), Some(5.0)),
      ("2024-01-01 00:00:40", Some(80.0), Some(15.0)),
      ("2024-01-01 00:01:20", Some(70.0), None))) // no usage_user point there
    assert(rows.head.schema.fieldNames.toSeq == Seq("time", "usage_idle", "usage_user"))
  }

  test("transforms, expressions, and selectors work on named fields") {
    val store = freshStore()
    // raw-point transform per named field
    val d = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT DERIVATIVE(usage_idle, 30s) AS d FROM cpu").collect()
    assert(d.map(_.getDouble(1)).toSeq == Seq(-10.0, -7.5)) // Δ30s: -10/1, -10/(40/30)
    // field math (the Grafana math box)
    val pct = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(usage_idle) / 100 AS frac FROM cpu").collect().head.getDouble(0)
    assert(pct == 0.8)
    // selectors on a single named field
    val fl = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT FIRST(usage_user) AS f, LAST(usage_user) AS l FROM cpu").collect().head
    assert((fl.getDouble(0), fl.getDouble(1)) == (5.0, 15.0))
    // selectors across SEVERAL named fields would mis-select on null
    // rows — pointed error instead
    val e = intercept[InfluxQLAst.InfluxQLParseException](
      InfluxQLPlanner.sqlStore(spark, store,
        "SELECT FIRST(usage_idle) AS a, FIRST(usage_user) AS b FROM cpu").collect())
    assert(e.getMessage.contains("one field per statement"))
  }

  test("field-value WHERE predicates — the Grafana threshold shape") {
    val store = freshStore()
    // aggregate over the filtered field's own values
    val m = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(usage_idle) AS m FROM cpu WHERE usage_idle > 75").collect().head
    assert(m.getDouble(0) == 85.0) // (90+80)/2 — the 70 point fails the cond
    // raw multi-field select: the cond gates the whole POINT (InfluxDB's
    // point-level WHERE), not just the filtered field's row
    val rows = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT usage_idle, usage_user FROM cpu WHERE usage_idle > 75 ORDER BY time")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq == Seq(
      ("2024-01-01 00:00:10", 90.0, 5.0),
      ("2024-01-01 00:00:40", 80.0, 15.0)))
    // a raw select may filter on a field it does NOT select — the merge
    // carries the where-only column, planRaw drops it
    val other = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT usage_user FROM cpu WHERE usage_idle <= 80 ORDER BY time").collect()
    assert(other.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("2024-01-01 00:00:40", 15.0))) // 00:01:20 has no usage_user value
    // field conds compose with tag/time conds (those keep their pushdown)
    val mixed = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT usage_idle FROM cpu WHERE usage_idle > 75 AND time < '2024-01-01 00:00:30'")
      .collect()
    assert(mixed.map(_.getDouble(1)).toSeq == Seq(90.0))
    // cross-field conds in an AGGREGATE need the point merge — pointed error
    val e = intercept[InfluxQLAst.InfluxQLParseException](
      InfluxQLPlanner.sqlStore(spark, store,
        "SELECT MEAN(usage_user) AS m FROM cpu WHERE usage_idle > 75").collect())
    assert(e.getMessage.contains("one field per statement"))
    // a field cond with no named field in SELECT is ambiguous — pointed error
    val e2 = intercept[InfluxQLAst.InfluxQLParseException](
      InfluxQLPlanner.sqlStore(spark, store,
        "SELECT MEAN(value) AS m FROM cpu WHERE usage_idle > 75").collect())
    assert(e2.getMessage.contains("name fields in SELECT"))
    // unknown field in WHERE: no point has it → empty (InfluxDB behavior)
    assert(InfluxQLPlanner.sqlStore(spark, store,
      "SELECT usage_idle FROM cpu WHERE no_such > 0").count() == 0)
  }

  test("unknown field names yield empty results, not errors (InfluxDB behavior)") {
    val store = freshStore()
    assert(InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(no_such_field) AS m FROM cpu").collect().forall(_.isNullAt(0)))
    assert(InfluxQLPlanner.sqlStore(spark, store,
      "SELECT no_such_field FROM cpu").count() == 0)
    // the classic store shape is untouched: value + alias tag still work
    val v = InfluxQLPlanner.sqlStore(spark, store,
      "SELECT MEAN(value) AS m FROM cpu WHERE alias = 'usage_idle'").collect().head
    assert(v.getDouble(0) == 80.0)
  }

  test("SHOW FIELD KEYS lists the store's real field keys (Grafana's query-builder pull)") {
    val store = freshStore()
    val rows = InfluxQLPlanner.sqlStore(spark, store, "SHOW FIELD KEYS FROM cpu")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("usage_idle", "float"), ("usage_user", "float")))
    val card = InfluxQLPlanner.sqlStore(spark, store, "SHOW FIELD KEY CARDINALITY")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(card.toSeq == Seq(("cpu", 2L)))
  }

  test("field-name queries flow through the HTTP surface end-to-end") {
    val store = java.nio.file.Files.createTempDirectory("graft-fieldname-http").toString
    val h = InfluxQLHttp.startStore(spark, store)
    try {
      val wc = new java.net.URI(s"http://127.0.0.1:${h.port}/write?db=plc").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      wc.setRequestMethod("POST"); wc.setDoOutput(true)
      wc.getOutputStream.write(
        ("cpu usage_idle=90,usage_user=5 1704067210000000000\n" +
          "cpu usage_idle=80,usage_user=15 1704067240000000000").getBytes("UTF-8"))
      assert(wc.getResponseCode == 204); wc.disconnect()
      val q = java.net.URLEncoder.encode(
        "SELECT MEAN(usage_idle) AS i, MEAN(usage_user) AS u FROM cpu", "UTF-8")
      val conn = new java.net.URI(s"http://127.0.0.1:${h.port}/query?db=plc&q=$q").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      conn.disconnect()
      val vals = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body).at("/results/0/series/0/values/0")
      assert(vals.get(0).asDouble() == 85.0 && vals.get(1).asDouble() == 10.0, body.take(300))
    } finally h.stop()
  }
}
