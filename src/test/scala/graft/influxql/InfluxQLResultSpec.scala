package graft.influxql

import com.fasterxml.jackson.databind.ObjectMapper

import graft.SparkTestBase

/** The InfluxDB 1.x HTTP response shape (what Grafana's datasource parses):
  * well-formed JSON, one series per tag set, tags lifted out of columns,
  * RFC3339 times.
  */
class InfluxQLResultSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()

  test("grouped SELECT renders one series per tag set with RFC3339 times") {
    val json = InfluxQLResult.render(spark, dir,
      """SELECT MEAN(value) AS m FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-03'
        |GROUP BY time(1d), event_type""".stripMargin)
    val root = mapper.readTree(json)
    val series = root.at("/results/0/series")
    assert(series.isArray && series.size() > 1, json.take(300))
    val s0 = series.get(0)
    assert(s0.at("/name").asText() == "events")
    assert(s0.at("/tags/event_type").asText().nonEmpty)
    // tags are NOT repeated in columns; time is RFC3339
    val cols = (0 until s0.at("/columns").size()).map(i => s0.at(s"/columns/$i").asText())
    assert(cols == Seq("time", "m"))
    val t0 = s0.at("/values/0/0").asText()
    assert(t0.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""), t0)
    assert(s0.at("/values/0/1").isNumber)
    // every tag set appears exactly once
    val tagVals = (0 until series.size()).map(i => series.get(i).at("/tags/event_type").asText())
    assert(tagVals.distinct == tagVals)
  }

  test("ungrouped SELECT renders a single series; SHOW renders its catalog shape") {
    val json = InfluxQLResult.render(spark, dir,
      "SELECT COUNT(value) AS n FROM events")
    val root = mapper.readTree(json)
    assert(root.at("/results/0/series").size() == 1)
    assert(root.at("/results/0/series/0/columns/0").asText() == "n")
    assert(root.at("/results/0/series/0/values/0/0").asLong() > 0)

    val show = mapper.readTree(InfluxQLResult.render(spark, dir, "SHOW MEASUREMENTS"))
    assert(show.at("/results/0/series/0/name").asText() == "measurements")
    assert(show.at("/results/0/series/0/values/0/0").asText() == "events")
  }

  test("a ;-separated statement batch renders one result per statement_id") {
    val json = InfluxQLResult.renderAll(spark, dir,
      """SELECT COUNT(value) AS n FROM events;
        |SHOW MEASUREMENTS;
        |SELECT MEAN(value) AS m FROM events GROUP BY event_type""".stripMargin)
    val root = mapper.readTree(json)
    val results = root.at("/results")
    assert(results.size() == 3)
    assert((0 until 3).forall(i => results.get(i).at("/statement_id").asInt() == i))
    assert(results.get(1).at("/series/0/name").asText() == "measurements")
    assert(results.get(2).at("/series").size() > 1)
  }

  test("a mid-batch execution error embeds per statement; parse errors still fail the batch") {
    // statement 1 references a field the measurement doesn't have — a
    // store-state error only discoverable at execution. InfluxDB 1.x
    // embeds {"statement_id":1,"error":…} and keeps executing.
    val json = InfluxQLResult.renderAll(spark, dir,
      "SELECT COUNT(value) AS n FROM events; SELECT bogus_field FROM events; SHOW MEASUREMENTS")
    val root = mapper.readTree(json)
    assert(root.at("/results").size() == 3, json.take(300))
    assert(root.at("/results/0/series/0/values/0/0").asLong() > 0)
    assert(root.at("/results/1/error").asText().nonEmpty, json.take(300))
    assert(root.at("/results/1/series").isMissingNode)
    assert(root.at("/results/2/series/0/name").asText() == "measurements")
    // a parse/validate error anywhere still fails the whole batch —
    // InfluxDB 400s the query string before executing anything
    intercept[InfluxQLAst.InfluxQLParseException] {
      InfluxQLResult.renderAll(spark, dir,
        "SELECT COUNT(value) AS n FROM events; SELECT BOGUS(value) FROM events")
    }
  }

  test("raw select with LIMIT renders bounded values (panel-sized collect)") {
    val json = InfluxQLResult.render(spark, dir,
      """SELECT value, user_id FROM events
        |WHERE time >= '2024-01-10' AND time < '2024-01-11'
        |ORDER BY time DESC LIMIT 7""".stripMargin)
    val root = mapper.readTree(json)
    assert(root.at("/results/0/series/0/values").size() == 7)
    assert((0 until 3).forall(i =>
      root.at(s"/results/0/series/0/values/$i/0").asText().endsWith("Z")))
  }

  test("an over-cap raw select truncates at maxRows and marks the statement partial") {
    // no LIMIT in the query — before the cap this collected the whole
    // measurement onto the driver; now it renders the first chunk only
    val json = InfluxQLResult.render(spark, dir,
      "SELECT value, user_id FROM events", maxRows = 5)
    val root = mapper.readTree(json)
    assert(root.at("/results/0/series/0/values").size() == 5, json.take(300))
    assert(root.at("/results/0/partial").asBoolean(), json.take(300))
    // an under-cap statement carries no partial marker
    val ok = mapper.readTree(InfluxQLResult.render(spark, dir,
      "SELECT COUNT(value) AS n FROM events", maxRows = 5))
    assert(ok.at("/results/0/partial").isMissingNode)
  }

  test("FROM /re/ renders one correctly-named series per matched measurement") {
    import org.apache.spark.sql.functions._
    val root0 = java.nio.file.Files.createTempDirectory("graft-render-re").toFile
    val base = graft.tables.Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
    // two measurements with different row counts so mislabeled merging
    // would be visible in the counts
    graft.sinks.PointStore.writePartitioned(
      base.select(col("ts"), lit("plc_a").as("measurement"),
        col("event_type").as("alias"), col("value")), root0.toString)
    graft.sinks.PointStore.writePartitioned(
      base.filter(col("event_type") === "click")
        .select(col("ts"), lit("plc_b").as("measurement"),
          col("event_type").as("alias"), col("value")), root0.toString)
    val cat = InfluxQLPlanner.Catalog.store(root0.toString)
    val json = InfluxQLResult.render(spark, root0.toString,
      "SELECT COUNT(value) AS n FROM /plc_/", catalog = cat)
    val root = mapper.readTree(json)
    val series = root.at("/results/0/series")
    assert(series.size() == 2, json.take(400))
    val byName = (0 until 2).map(i =>
      series.get(i).at("/name").asText() -> series.get(i).at("/values/0/0").asLong()).toMap
    assert(byName.keySet == Set("plc_a", "plc_b"), json.take(400))
    // counts are PER measurement, not the union mislabeled under one name
    val na = spark.read.parquet(s"$root0/measurement=plc_a").count()
    val nb = spark.read.parquet(s"$root0/measurement=plc_b").count()
    assert(na != nb && byName("plc_a") == na && byName("plc_b") == nb)

    // maxRows is the STATEMENT budget across all matched measurements —
    // a wide regex cannot multiply the driver-side collect
    val capped = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SELECT value FROM /plc_/", catalog = cat, maxRows = 5))
    val cs = capped.at("/results/0/series")
    val totalVals = (0 until cs.size()).map(i => cs.get(i).at("/values").size()).sum
    assert(totalVals <= 5, capped.toString.take(300))
    assert(capped.at("/results/0/partial").asBoolean())

    // FROM m1, m2 (comma union) rides the same per-measurement path:
    // one correctly-named series per listed measurement
    val listed = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SELECT COUNT(value) AS n FROM plc_a, plc_b", catalog = cat))
    val lser = listed.at("/results/0/series")
    assert(lser.size() == 2, listed.toString.take(400))
    val lByName = (0 until 2).map(i =>
      lser.get(i).at("/name").asText() -> lser.get(i).at("/values/0/0").asLong()).toMap
    assert(lByName == Map("plc_a" -> na, "plc_b" -> nb), listed.toString.take(400))

    // an aggregate over a regex-FROM SUBQUERY names the series after the
    // first catalog match, never the internal "re:" encoding
    val sub = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SELECT MAX(n) AS mx FROM (SELECT COUNT(value) AS n FROM /plc_/ GROUP BY alias)",
      catalog = cat))
    assert(sub.at("/results/0/series/0/name").asText() == "plc_a", sub.toString.take(300))
  }

  test("SHOW TAG VALUES renders one series per measurement; WHERE/LIMIT apply") {
    import org.apache.spark.sql.functions._
    val root0 = java.nio.file.Files.createTempDirectory("graft-render-tv").toFile
    val base = graft.tables.Tables.events(spark, dir)
      .filter(col("ts") < lit("2024-01-03").cast("timestamp"))
    graft.sinks.PointStore.writePartitioned(
      base.select(col("ts"), lit("plc_a").as("measurement"),
        col("event_type").as("alias"), col("value")), root0.toString)
    graft.sinks.PointStore.writePartitioned(
      base.filter(col("event_type") === "click")
        .select(col("ts"), lit("plc_b").as("measurement"),
          col("event_type").as("alias"), col("value")), root0.toString)
    val cat = InfluxQLPlanner.Catalog.store(root0.toString)

    // no FROM → every measurement, one series per measurement (InfluxDB's
    // series identity), each named after its measurement
    val json = InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES WITH KEY = alias", catalog = cat)
    val series = mapper.readTree(json).at("/results/0/series")
    assert(series.size() == 2, json.take(400))
    val byName = (0 until 2).map(i => series.get(i).at("/name").asText() ->
      (0 until series.get(i).at("/values").size())
        .map(j => series.get(i).at(s"/values/$j/1").asText()).toSet).toMap
    assert(byName.keySet == Set("plc_a", "plc_b"), json.take(400))
    assert(byName("plc_b") == Set("click"), json.take(400))
    assert(byName("plc_a").contains("click") && byName("plc_a").size > 1)

    // a WHERE that empties one measurement omits its series entirely
    val narrowed = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES WITH KEY = alias WHERE alias != 'click'", catalog = cat))
    val ns = narrowed.at("/results/0/series")
    assert(ns.size() == 1 && ns.get(0).at("/name").asText() == "plc_a",
      narrowed.toString.take(400))

    // LIMIT pages PER SERIES (InfluxDB 1.x), so both series shrink to 1 row
    val limited = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES WITH KEY = alias LIMIT 1", catalog = cat))
    val ls = limited.at("/results/0/series")
    assert(ls.size() == 2 && (0 until 2).forall(i =>
      ls.get(i).at("/values").size() == 1), limited.toString.take(400))

    // maxRows is still the statement budget across the series
    val capped = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES WITH KEY = alias", catalog = cat, maxRows = 1))
    assert(capped.at("/results/0/partial").asBoolean(), capped.toString.take(300))

    // FROM /re/ restricts the listing to matching measurements (the
    // Grafana templated-dashboard shape for chained variables)
    val reJson = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES FROM /_b$/ WITH KEY = alias", catalog = cat))
    val rs = reJson.at("/results/0/series")
    assert(rs.size() == 1 && rs.get(0).at("/name").asText() == "plc_b",
      reJson.toString.take(400))

    // CARDINALITY: one count series per measurement, column "count"
    val card = mapper.readTree(InfluxQLResult.render(spark, root0.toString,
      "SHOW TAG VALUES CARDINALITY WITH KEY = alias", catalog = cat))
    val cs2 = card.at("/results/0/series")
    assert(cs2.size() == 2, card.toString.take(400))
    val counts = (0 until 2).map(i => cs2.get(i).at("/name").asText() ->
      cs2.get(i).at("/values/0/0").asLong()).toMap
    assert(counts("plc_a") == byName("plc_a").size.toLong &&
      counts("plc_b") == 1L, card.toString.take(400))
    assert(cs2.get(0).at("/columns/0").asText() == "count")
  }
}
