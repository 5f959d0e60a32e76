package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import Q._

/** Scalar functions — SURVEY.md §2.8 (F2-F12). All builtins — codegen'd
  * inside WholeStageCodegen spans; no UDFs anywhere in this file.
  */
object QFunc {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_cast",
      "F2: typed coercion replacing the reference's eval() (ref InfluxConnector2.py:47-51)",
      """SELECT p_partkey,
        |       CAST(regexp_extract(p_brand, '[0-9]+') AS BIGINT) AS brand_num,
        |       CAST(p_size AS VARCHAR) AS size_str,
        |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |       CAST(CAST(p_size > 20 AS INT) AS BIGINT) AS is_large
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      part(s, dir).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).cast("bigint").as("brand_num"),
        col("p_size").cast("string").as("size_str"),
        floor(col("p_retailprice")).cast("bigint").as("price_floor"),
        (col("p_size") > 20).cast("int").cast("bigint").as("is_large"))
        .orderBy("p_partkey")
    },

    GraftQuery(
      "q_bit_extract",
      "F3/D3: bit extraction via shift+mask (ref snap7 get_bool, InfluxConnector2.py:155,170)",
      """SELECT event_id, (user_id >> 0) & 1 AS bit0, (user_id >> 3) & 1 AS bit3,
        |       user_id & 7 AS low3
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        shiftright(col("user_id"), 0).bitwiseAND(1).as("bit0"),
        shiftright(col("user_id"), 3).bitwiseAND(1).as("bit3"),
        col("user_id").bitwiseAND(7).as("low3"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_format",
      "F4: string formatting (ref my_data.__str__, InfluxConnector2.py:60-62)",
      """SELECT event_id,
        |       printf('PLC IP: %s, TYPE: %s, ADDRESS: %d', '10.0.0.' || user_id, event_type, event_id) AS msg
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        format_string("PLC IP: %s, TYPE: %s, ADDRESS: %d",
          concat(lit("10.0.0."), col("user_id").cast("string")), col("event_type"), col("event_id")).as("msg"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_to_json",
      "F5: JSON construction (ref create_my_json, InfluxConnector2.py:230-239)",
      """SELECT event_id, to_json(struct_pack(event_type := event_type, user_id := user_id)) AS j
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        to_json(struct(col("event_type"), col("user_id"))).as("j"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_json_extract",
      "F6: JSON field extraction from events.props",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_time_math",
      "F7: epoch conversion + interval arithmetic (ref adaptive sleep, InfluxConnector2.py:177-186)",
      """SELECT event_id, epoch_us(ts) // 1000000 AS epoch_s, hour(ts::TIMESTAMP) AS hr,
        |       strftime(ts::TIMESTAMP + INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS plus1h
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        expr("unix_micros(ts) div 1000000").as("epoch_s"),
        hour(col("ts")).cast("bigint").as("hr"),
        tsS(col("ts") + expr("INTERVAL 1 HOUR")).as("plus1h"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_interval_parse",
      "F9: interval-string parse '10s' → seconds (ref InfluxConnector2.py:182-184)",
      """SELECT iv, CASE WHEN iv = 'min' THEN 0
        |              ELSE CAST(regexp_extract(iv, '[0-9]+') AS BIGINT) END AS seconds,
        |       count(*) AS n
        |FROM (SELECT CASE event_type WHEN 'click' THEN '1s' WHEN 'view' THEN '2s'
        |               WHEN 'purchase' THEN '10s' WHEN 'signup' THEN '60s' ELSE 'min' END AS iv
        |      FROM events)
        |GROUP BY iv ORDER BY iv""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("iv",
          when(col("event_type") === "click", "1s").when(col("event_type") === "view", "2s")
            .when(col("event_type") === "purchase", "10s").when(col("event_type") === "signup", "60s")
            .otherwise("min"))
        .groupBy("iv")
        .agg(count(lit(1)).as("n"))
        .select(col("iv"),
          when(col("iv") === "min", lit(0L))
            .otherwise(regexp_extract(col("iv"), "[0-9]+", 0).cast("bigint")).as("seconds"),
          col("n"))
        .orderBy("iv")
    },

    GraftQuery(
      "q_map_ops",
      "F11: map construct/lookup (the point fields map, ref InfluxConnector2.py:235-238)",
      """SELECT event_id, event_type AS k0, round(value, 2) AS v0, CAST(1 AS BIGINT) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      // Spark side genuinely builds and queries a MapType column; the oracle
      // states the equivalent scalars (DuckDB map internals don't hash-match).
      events(s, dir)
        .withColumn("fields", map(col("event_type"), round(col("value"), 2)))
        .select(
          col("event_id"),
          map_keys(col("fields")).getItem(0).as("k0"),
          element_at(col("fields"), col("event_type")).as("v0"),
          size(col("fields")).cast("bigint").as("n_keys"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_math",
      "F12: math surface — abs/round/floor/ceil/sqrt/ln/log10, engineering-unit scaling (InfluxQL, README.md:3)",
      // logs take value+1: the domain includes exact zeros (seen at sf0.1),
      // where DuckDB's ln(0) ERRORS while Spark yields null — log1p keeps
      // both engines total and identical on value >= 0
      """SELECT event_id, round(abs(value - 100), 2) AS a, round(value, 1) AS r,
        |       CAST(floor(value) AS BIGINT) AS f, CAST(ceil(value) AS BIGINT) AS c,
        |       round(sqrt(value), 6) AS sq, round(value * value, 4) AS p2,
        |       round(ln(value + 1), 6) AS lnv, round(log10(value + 1), 6) AS lgv
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir).select(
        col("event_id"),
        round(abs(col("value") - 100), 2).as("a"),
        round(col("value"), 1).as("r"),
        floor(col("value")).cast("bigint").as("f"),
        ceil(col("value")).cast("bigint").as("c"),
        round(sqrt(col("value")), 6).as("sq"),
        round(col("value") * col("value"), 4).as("p2"),
        round(log(col("value") + 1), 6).as("lnv"),
        round(log10(col("value") + 1), 6).as("lgv"))
        .orderBy("event_id")
    },
  )
}
