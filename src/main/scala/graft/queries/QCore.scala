package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.tables.Tables
import Q._

/** Scans, projections, filters, set ops, sorts — SURVEY.md §2.1/2.2/2.6/2.7.
  *
  * Reference behaviors re-expressed Spark-first:
  *  - S2 event scan        (ref Linux/InfluxConnector2.py:142-170 read loop)
  *  - S3/P2 point shaping  (ref Linux/InfluxConnector2.py:222-240 create_my_json)
  *  - P1 active filter     (ref Linux/InfluxConnector2.py:263-264)
  *  - P4 not-null guard    (ref Linux/InfluxConnector2.py:172)
  *  - P3 address parse     (ref Linux/InfluxConnector2.py:212-219 getNumbers)
  *  - P5/P6 decode dispatch(ref Linux/InfluxConnector2.py:141-170)
  *  - P7 time-range        (InfluxQL WHERE time > t0, ref README.md:3)
  *
  * All scans are plain parquet reads: Catalyst pushes the filters and prunes
  * columns down to the scan (verified via explain — PushedFilters/ReadSchema),
  * which is the 100 TB story: a time-range query touches only the row groups
  * whose min/max ts stats overlap the range.
  */
object QCore {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_scan_events",
      "S2: full event scan, typed projection (streaming source's batch twin)",
      """SELECT event_id, strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |       user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .select($("event_id"), tsS($("ts")).as("ts_s"), $("user_id"), $("event_type"), $("value"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_points_shape",
      "S3/P2: project samples into InfluxDB-point shape (measurement + fields json), ref InfluxConnector2.py:222-240",
      """SELECT event_id, 'plc-' || user_id AS measurement,
        |       printf('{"%s":%.2f}', event_type, value) AS fields_json
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .select(
          $("event_id"),
          concat(lit("plc-"), $("user_id").cast("string")).as("measurement"),
          format_string("""{"%s":%.2f}""", $("event_type"), $("value")).as("fields_json"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_filter_active",
      "P1: active-row predicate filter (ref InfluxConnector2.py:263-264); pushed to parquet scan",
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      orders(s, dir)
        .filter($("o_orderstatus") === "O")
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    },

    GraftQuery(
      "q_filter_notnull",
      "P4: drop rows whose decode produced no value (ref InfluxConnector2.py:172)",
      """SELECT event_id, value AS v FROM events WHERE value >= 10 ORDER BY event_id""") { (s, dir) =>
      events(s, dir)
        .withColumn("v", when($("value") >= 10, $("value")))
        .filter(col("v").isNotNull)
        .select("event_id", "v")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_addr_parse",
      "P3/F1: S7 address parse via regexp_extract_all (ref getNumbers, InfluxConnector2.py:212-219)",
      """SELECT p_partkey,
        |       CASE p_partkey % 4
        |         WHEN 0 THEN 'DB' || p_size || '.DBW' || (p_partkey % 100)
        |         WHEN 1 THEN 'I' || (p_partkey % 8) || '.' || (p_size % 8)
        |         WHEN 2 THEN 'QW' || p_size
        |         ELSE 'MW' || (p_partkey % 100) END AS addr,
        |       array_to_string(regexp_extract_all(
        |         CASE p_partkey % 4
        |           WHEN 0 THEN 'DB' || p_size || '.DBW' || (p_partkey % 100)
        |           WHEN 1 THEN 'I' || (p_partkey % 8) || '.' || (p_size % 8)
        |           WHEN 2 THEN 'QW' || p_size
        |           ELSE 'MW' || (p_partkey % 100) END, '[0-9]+'), ',') AS nums
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val addr = when($("p_partkey") % 4 === 0,
          concat(lit("DB"), $("p_size").cast("string"), lit(".DBW"), ($("p_partkey") % 100).cast("string")))
        .when($("p_partkey") % 4 === 1,
          concat(lit("I"), ($("p_partkey") % 8).cast("string"), lit("."), ($("p_size") % 8).cast("string")))
        .when($("p_partkey") % 4 === 2, concat(lit("QW"), $("p_size").cast("string")))
        .otherwise(concat(lit("MW"), ($("p_partkey") % 100).cast("string")))
      part(s, dir)
        .withColumn("addr", addr)
        .select($("p_partkey"), col("addr"),
          concat_ws(",", regexp_extract_all(col("addr"), lit("[0-9]+"), lit(0))).as("nums"))
        .orderBy("p_partkey")
    },

    GraftQuery(
      "q_case_dispatch",
      "P5/P6: area/type decode dispatch as a CASE tree (ref InfluxConnector2.py:141-170)",
      """SELECT event_id,
        |       CASE (user_id % 4) WHEN 0 THEN 132 WHEN 1 THEN 129 WHEN 2 THEN 130 ELSE 131 END AS area,
        |       CASE
        |         WHEN (user_id % 4) = 0 AND event_type IN ('click','view') THEN round(value, 2)
        |         WHEN (user_id % 4) = 0                                    THEN CAST(floor(value) AS DOUBLE)
        |         WHEN event_type = 'purchase'                              THEN CAST(CAST(value > 100 AS INT) AS DOUBLE)
        |         WHEN event_type = 'error'                                 THEN NULL
        |         ELSE round(value / 2, 3) END AS decoded
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("area",
          when($("user_id") % 4 === 0, 132).when($("user_id") % 4 === 1, 129)
            .when($("user_id") % 4 === 2, 130).otherwise(131))
        .withColumn("decoded",
          when($("user_id") % 4 === 0 && $("event_type").isin("click", "view"), round($("value"), 2))
            .when($("user_id") % 4 === 0, floor($("value")).cast("double"))
            .when($("event_type") === "purchase", ($("value") > 100).cast("int").cast("double"))
            .when($("event_type") === "error", lit(null).cast("double"))
            // scale 3: value/2 of a 2-decimal double is exact at 3 decimals,
            // avoiding Spark-vs-DuckDB half-rounding divergence at .xx5
            .otherwise(round($("value") / 2, 3)))
        .select("event_id", "area", "decoded")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_time_range",
      "P7: time-range predicate (InfluxQL WHERE time > t0); pushed to parquet row-group stats",
      """SELECT event_id, strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts_s, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // eventsTimeBound puts the predicate on whichever of ts/ts_ns is the
      // native parquet column, so it reaches row-group stats. 2024-01-10/20.
      Tables.eventsTimeBound(events(s, dir), 1704844800000000000L, 1705708800000000000L)
        .select($("event_id"), tsS($("ts")).as("ts_s"), $("value"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_sort",
      "O1: total sort (range-partitioned at scale), ref ConfigApp.py:86-100 ordered enumeration",
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |ORDER BY c_mktsegment, c_name""".stripMargin) { (s, dir) =>
      customer(s, dir)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_mktsegment", "c_name")
    },

    GraftQuery(
      "q_topk_global",
      "O2/O3: global top-k — plans as TakeOrderedAndProject, no full sort",
      """SELECT event_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 100""".stripMargin) { (s, dir) =>
      events(s, dir)
        .select("event_id", "event_type", "value")
        .orderBy($("value").desc, $("event_id"))
        .limit(100)
    },

    GraftQuery(
      "q_union",
      "U1: UNION ALL of two filtered scans (ref join_data_to_list, InfluxConnector2.py:121-122)",
      """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, user_id, event_type FROM events WHERE event_type = 'view'
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir).select("event_id", "user_id", "event_type")
      e.filter($("event_type") === "click")
        .unionByName(e.filter($("event_type") === "view"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_distinct",
      "U2: DISTINCT via hash aggregate (ref duplicate check, ConfigApp.py:57-60)",
      """SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type""") { (s, dir) =>
      events(s, dir).select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")
    },

    GraftQuery(
      "q_except",
      "U3: EXCEPT (plans as left-anti), ref delete_element ConfigApp.py:138-153",
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      customer(s, dir).select("c_custkey")
        .except(orders(s, dir).select($("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    },

    GraftQuery(
      "q_intersect",
      "U4: INTERSECT — users who both clicked and purchased",
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      e.filter($("event_type") === "click").select("user_id")
        .intersect(e.filter($("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q_unpivot",
      "U5: UNPIVOT — wide metric columns to long (metric, val) rows; Spark-native melt, no shuffle",
      // Oracle states it as portable UNION ALL; Spark executes the native
      // unpivot (an Expand node — one pass over the scan, zero shuffles).
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_quantity', l_quantity
        |  FROM lineitem WHERE l_orderkey < 200
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
        |  FROM lineitem WHERE l_orderkey < 200
        |) ORDER BY l_orderkey, l_linenumber, metric""".stripMargin) { (s, dir) =>
      lineitem(s, dir)
        .filter($("l_orderkey") < 200)
        .unpivot(
          Array($("l_orderkey"), $("l_linenumber")),
          Array($("l_discount"), $("l_quantity"), $("l_tax")),
          "metric", "val")
        .orderBy("l_orderkey", "l_linenumber", "metric")
    },
  )

  private def $(name: String) = col(name)
}
