package graft.queries

import graft.GraftQuery
import graft.influxql.InfluxQLPlanner

/** The InfluxQL textual front-end, driven end-to-end (VERDICT r4 #2): each
  * query here is a STRING in the reference's declared query language (ref
  * README.md:3,98-100 — InfluxQL via InfluxDB 1.7 + Grafana), parsed by
  * InfluxQLParser and planned by InfluxQLPlanner onto the engine's proven
  * operators. The oracles are the same DuckDB twins those operators
  * already hash-match, so a green row here certifies the whole
  * string → AST → DataFrame path, not just the building blocks.
  */
object QInfluxQL {

  private def influx(q: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    (s, dir) => InfluxQLPlanner.sql(s, dir, q)

  /** Shared recursive-CTE prefix for the EMA-family oracles (N = 9, so
    * a = 2/10): hourly MEAN buckets (a) → per-series arrays (o) → first
    * EMA fold (s1) collected as v1 (o2) → second fold (s2) collected as
    * v2 (o3) → third fold (s3, e = e3_k). Identical op order to the
    * planner's array fold, so every double is bit-equal before the final
    * floor-truncation. */
  private val dEmaA = "(CAST(2 AS DOUBLE) / 10)"
  private val dEmaPrefix =
    s"""WITH RECURSIVE a AS (
       |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
       |         round(avg(value), 4) AS m
       |  FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
       |  GROUP BY 1, 2),
       |o AS (
       |  SELECT user_id, array_agg(m ORDER BY t) AS vals, array_agg(t ORDER BY t) AS ts_,
       |         count(*) AS n
       |  FROM a GROUP BY user_id),
       |s1(user_id, vals, ts_, n, k, e) AS (
       |  SELECT user_id, vals, ts_, n, CAST(1 AS BIGINT), vals[1]::DOUBLE FROM o
       |  UNION ALL
       |  SELECT user_id, vals, ts_, n, k + 1, $dEmaA * vals[k + 1] + (1.0 - $dEmaA) * e
       |  FROM s1 WHERE k < n),
       |o2 AS (SELECT user_id, ts_, n, array_agg(e ORDER BY k) AS v1
       |       FROM s1 GROUP BY user_id, ts_, n),
       |s2(user_id, v1, ts_, n, k, e) AS (
       |  SELECT user_id, v1, ts_, n, CAST(1 AS BIGINT), v1[1] FROM o2
       |  UNION ALL
       |  SELECT user_id, v1, ts_, n, k + 1, $dEmaA * v1[k + 1] + (1.0 - $dEmaA) * e
       |  FROM s2 WHERE k < n),
       |o3 AS (SELECT user_id, v1, ts_, n, array_agg(e ORDER BY k) AS v2
       |       FROM s2 GROUP BY user_id, v1, ts_, n),
       |s3(user_id, v1, v2, ts_, n, k, e) AS (
       |  SELECT user_id, v1, v2, ts_, n, CAST(1 AS BIGINT), v2[1] FROM o3
       |  UNION ALL
       |  SELECT user_id, v1, v2, ts_, n, k + 1, $dEmaA * v2[k + 1] + (1.0 - $dEmaA) * e
       |  FROM s3 WHERE k < n)""".stripMargin

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_influxql_basic",
      "IQL1: textual `SELECT MEAN,COUNT ... GROUP BY time(1h), tag` through the parser (README.md:3)",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type, round(avg(value), 4) AS mean_value, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MEAN(value) AS mean_value, COUNT(value) AS n FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_fill",
      "IQL2: textual `GROUP BY time(1h), tag fill(previous)` — grid + forward-fill through the parser",
      """WITH a AS (
        |  SELECT user_id,
        |         time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS mean_value
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT u.user_id, s.t
        |  FROM (SELECT DISTINCT user_id FROM a) u
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03 23:00:00', INTERVAL 1 HOUR)) AS t) s),
        |j AS (SELECT g.user_id, g.t, a.mean_value FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.t = a.t)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       last_value(mean_value IGNORE NULLS) OVER (
        |         PARTITION BY user_id ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_value
        |FROM j ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT MEAN(value) AS mean_value FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-04'
        |GROUP BY time(1h), user_id fill(previous)""".stripMargin)),

    GraftQuery(
      "q_influxql_fill_linear",
      "IQL3: textual `GROUP BY time(1h), tag fill(linear)` — grid + interpolation through the parser",
      """WITH a AS (
        |  SELECT user_id,
        |         time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS v
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT u.user_id, s.t
        |  FROM (SELECT DISTINCT user_id FROM a) u
        |  CROSS JOIN (SELECT unnest(generate_series(
        |    TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-03 23:00:00', INTERVAL 1 HOUR)) AS t) s),
        |j AS (SELECT g.user_id, g.t, a.v FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.t = a.t),
        |ctx AS (
        |  SELECT user_id, t, v,
        |         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |         last_value(CASE WHEN v IS NOT NULL THEN epoch_us(t) END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
        |         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
        |         first_value(CASE WHEN v IS NOT NULL THEN epoch_us(t) END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       CASE WHEN v IS NOT NULL THEN v
        |            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |              floor((pv + (nv - pv) * (epoch_us(t) - ph) / (nh - ph)) * 10000) / 10000
        |       END AS mean_value
        |FROM ctx ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT MEAN(value) AS mean_value FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-04'
        |GROUP BY time(1h), user_id fill(linear)""".stripMargin)),

    GraftQuery(
      "q_influxql_raw",
      "IQL4: textual raw select with tag filter, ORDER BY time DESC, LIMIT — TakeOrderedAndProject path",
      """SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time, value, user_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'
        |  AND event_type = 'click'
        |ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin)(influx(
      """SELECT value, user_id FROM events
        |WHERE time >= '2024-01-10' AND time < '2024-01-11' AND event_type = 'click'
        |ORDER BY time DESC LIMIT 100""".stripMargin)),

    GraftQuery(
      "q_influxql_selectors",
      "IQL5: textual FIRST/LAST/SPREAD/PERCENTILE per tag (no time bucket) through the parser",
      """SELECT event_type,
        |       arg_min(value, ts) AS first_value, arg_max(value, ts) AS last_value,
        |       round(max(value) - min(value), 2) AS spread_value,
        |       round(quantile_cont(value, 0.9), 4) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)(influx(
      """SELECT FIRST(value) AS first_value, LAST(value) AS last_value,
        |       SPREAD(value) AS spread_value, PERCENTILE(value, 90) AS p90
        |FROM events GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_derivative",
      "IQL7: textual DERIVATIVE(MEAN(value), 1h) GROUP BY time(1h), tag — the Grafana rate-panel shape",
      """WITH a AS (
        |  SELECT user_id,
        |         time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       round((m - lag(m) OVER (PARTITION BY user_id ORDER BY t))
        |             / ((epoch_us(t) - lag(epoch_us(t)) OVER (PARTITION BY user_id ORDER BY t))
        |                / 3600000000.0), 6) + 0 AS dmean
        |FROM a ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT DERIVATIVE(MEAN(value), 1h) AS dmean FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_raw_derivative",
      "IQL56: textual DERIVATIVE(value) over RAW points per series — the Grafana raw-series " +
        "rate panel (no aggregate, no time bucket); warm-up rows drop, unit defaults 1s",
      """WITH d AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(value) OVER w AS pv,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dus
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       round((value - pv) / (dus / 1000000.0), 6) + 0 AS derivative
        |FROM d WHERE pv IS NOT NULL
        |ORDER BY user_id, ts, event_id""".stripMargin)(influx(
      """SELECT DERIVATIVE(value) FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-03'
        |GROUP BY user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_count_star",
      "IQL57: COUNT(*) — the wildcard-field aggregate, expanded against the catalog's " +
        "field set and named count_<field> like InfluxDB",
      "SELECT count(value) AS count_value FROM events")(influx(
      "SELECT COUNT(*) FROM events")),

    GraftQuery(
      "q_influxql_movavg",
      "IQL8: textual MOVING_AVERAGE(MEAN(value), 3) GROUP BY time(1h), tag — smoothed dashboard " +
        "series; InfluxDB emits NOTHING until the window fills, so the first N-1 buckets per series drop",
      """WITH a AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT t, event_type,
        |         round(avg(m) OVER w, 4) AS ma,
        |         count(*) OVER w AS wn
        |  FROM a
        |  WINDOW w AS (PARTITION BY event_type ORDER BY t
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, event_type, ma
        |FROM s WHERE wn = 3 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MOVING_AVERAGE(MEAN(value), 3) AS ma FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_cumsum",
      "IQL9: textual CUMULATIVE_SUM(SUM(value)) GROUP BY time(1d), tag — counter totalization",
      """WITH a AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL '1 day', ts::TIMESTAMP) AS t,
        |         round(sum(value), 2) AS sv
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, event_type,
        |       round(sum(sv) OVER (PARTITION BY event_type ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cs
        |FROM a ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT CUMULATIVE_SUM(SUM(value)) AS cs FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1d), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_top",
      "IQL11: textual TOP(value, 3) per tag — row selector with times (InfluxQL TOP/BOTTOM)",
      """SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time, event_type, value AS top_value
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY event_type ORDER BY value DESC, ts, event_id) AS rn
        |      FROM events
        |      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08')
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin)(influx(
      """SELECT TOP(value, 3) AS top_value FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_subquery",
      "IQL13: aggregate-of-aggregate subquery — MAX/MEAN of hourly means per tag (Grafana peak panels)",
      """WITH a AS (
        |  SELECT event_type,
        |         time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2)
        |SELECT event_type, max(m) AS peak_hourly, round(avg(m), 4) AS avg_hourly
        |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin)(influx(
      """SELECT MAX(m) AS peak_hourly, MEAN(m) AS avg_hourly FROM
        |  (SELECT MEAN(value) AS m FROM events
        |   WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |   GROUP BY time(1h), event_type)
        |GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_tag_values",
      "IQL12: SHOW TAG VALUES WITH KEY = event_type — the Grafana template-variable dropdown",
      """SELECT 'event_type' AS key, event_type AS value
        |FROM events GROUP BY event_type ORDER BY value""".stripMargin)(influx(
      "SHOW TAG VALUES FROM events WITH KEY = event_type")),

    GraftQuery(
      "q_influxql_tag_values_chain",
      "IQL12: SHOW TAG VALUES WITH KEY IN (…) WHERE tag + time — the Grafana CHAINED template variable",
      """SELECT * FROM (
        |  SELECT 'event_type' AS key, event_type AS value FROM events
        |  WHERE event_type = 'click'
        |    AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |  GROUP BY 2
        |  UNION ALL
        |  SELECT 'user_id' AS key, CAST(user_id AS VARCHAR) AS value FROM events
        |  WHERE event_type = 'click'
        |    AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |  GROUP BY 2)
        |ORDER BY key, value""".stripMargin)(influx(
      """SHOW TAG VALUES FROM events WITH KEY IN (event_type, user_id)
        |WHERE event_type = 'click' AND time >= '2024-01-01' AND time < '2024-01-04'""".stripMargin)),

    GraftQuery(
      "q_influxql_tag_values_card",
      "IQL12: SHOW TAG VALUES CARDINALITY — per-measurement distinct-value count (exact)",
      """SELECT 'events' AS measurement, count(DISTINCT user_id) AS count
        |FROM events""".stripMargin)(influx(
      "SHOW TAG VALUES CARDINALITY FROM events WITH KEY = user_id")),

    GraftQuery(
      "q_influxql_show",
      "IQL10: SHOW TAG KEYS — the metadata statement Grafana's query builder polls",
      """SELECT * FROM (VALUES ('events', 'event_type'), ('events', 'user_id'))
        |  AS t(measurement, tag_key) ORDER BY tag_key""".stripMargin)(influx(
      "SHOW TAG KEYS FROM events")),

    GraftQuery(
      "q_influxql_math",
      "IQL14: field arithmetic over aggregates — MEAN(value)*100+5, SUM/COUNT (Grafana math box)",
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type,
        |       round(round(avg(value), 4) * 100 + 5, 4) AS scaled,
        |       round(round(sum(value), 2) / count(value), 4) AS ratio
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MEAN(value) * 100 + 5 AS scaled, SUM(value) / COUNT(value) AS ratio
        |FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1d), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_scalar",
      "IQL15: scalar math on a raw select — ABS/ROUND/FLOOR+CEIL/SQRT per row (InfluxQL 1.7 math)",
      """SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time,
        |       round(abs(value), 4) AS av,
        |       round(round(value, 2), 4) AS rv,
        |       round(floor(value) + ceil(value), 4) AS fc,
        |       round(sqrt(abs(value)), 4) AS sq
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'
        |ORDER BY ts, event_id LIMIT 200""".stripMargin)(influx(
      """SELECT ABS(value) AS av, ROUND(value, 2) AS rv,
        |       FLOOR(value) + CEIL(value) AS fc, SQRT(ABS(value)) AS sq
        |FROM events
        |WHERE time >= '2024-01-10' AND time < '2024-01-11'
        |ORDER BY time LIMIT 200""".stripMargin)),

    GraftQuery(
      "q_influxql_mode",
      "IQL16: MODE per tag — most frequent value, ties -> lowest (q_agg_mode convention)",
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id AS mode_user FROM (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, user_id) AS rn
        |  FROM c)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin)(influx(
      "SELECT MODE(user_id) AS mode_user FROM events GROUP BY event_type")),

    GraftQuery(
      "q_influxql_integral",
      "IQL17: INTEGRAL(value) GROUP BY time(1d), tag — trapezoid area per bucket through the parser",
      """WITH d AS (
        |  SELECT user_id,
        |         time_bucket(INTERVAL '1 day', ts::TIMESTAMP) AS t,
        |         value,
        |         lag(value) OVER w AS pv,
        |         epoch_us(ts) AS tu,
        |         lag(epoch_us(ts)) OVER w AS ptu
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  WINDOW w AS (PARTITION BY user_id, time_bucket(INTERVAL '1 day', ts::TIMESTAMP)
        |               ORDER BY ts, event_id))
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       round(sum((value + pv) / 2 * (tu - ptu) / 1000000.0), 2) AS integral
        |FROM d GROUP BY t, user_id ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT INTEGRAL(value) AS integral FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1d), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_count_distinct",
      "IQL18: COUNT(DISTINCT(tag)) per bucket — cardinality panels",
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type, count(DISTINCT user_id) AS nu, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT COUNT(DISTINCT(user_id)) AS nu, COUNT(value) AS n FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1d), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_distinct",
      "IQL19: DISTINCT(field) per tag — row selector, one row per distinct value",
      """SELECT DISTINCT event_type, user_id AS uid FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
        |ORDER BY event_type, uid""".stripMargin)(influx(
      """SELECT DISTINCT(user_id) AS uid FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-02'
        |GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_where_or",
      "IQL20: OR + parenthesized tag predicates (AND binds tighter, InfluxQL grammar)",
      """SELECT event_type, count(value) AS n, round(avg(value), 4) AS m
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  AND (event_type = 'click' OR user_id < 10)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)(influx(
      """SELECT COUNT(value) AS n, MEAN(value) AS m FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |  AND (event_type = 'click' OR user_id < 10)
        |GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_slimit",
      "IQL21: GROUP BY time(1d), * SLIMIT/SOFFSET — series pagination over all tags",
      """WITH a AS (
        |  SELECT time_bucket(INTERVAL '1 day', ts::TIMESTAMP) AS t, event_type, user_id,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
        |  GROUP BY 1, 2, 3),
        |s AS (SELECT DISTINCT event_type, user_id FROM a
        |      ORDER BY event_type, user_id LIMIT 3 OFFSET 1)
        |SELECT strftime(a.t, '%Y-%m-%d %H:%M:%S') AS time, a.event_type, a.user_id, a.m
        |FROM a JOIN s USING (event_type, user_id)
        |ORDER BY time, event_type, user_id""".stripMargin)(influx(
      """SELECT MEAN(value) AS m FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-03'
        |GROUP BY time(1d), * SLIMIT 3 SOFFSET 1""".stripMargin)),

    GraftQuery(
      "q_influxql_time_offset",
      "IQL22: GROUP BY time(1h, 30m) — offset-shifted bucket grid",
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP, INTERVAL '30 minutes'),
        |                '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type, round(avg(value), 4) AS m, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |GROUP BY 1, 2 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MEAN(value) AS m, COUNT(value) AS n FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-04'
        |GROUP BY time(1h, 30m), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_tz",
      "IQL23: GROUP BY time(1d) tz('America/New_York') — zone-local day buckets (oracle pins EST: the window is DST-free January)",
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts::TIMESTAMP - INTERVAL 5 HOUR),
        |                '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type, round(avg(value), 4) AS m, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |GROUP BY 1, 2 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MEAN(value) AS m, COUNT(value) AS n FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1d), event_type tz('America/New_York')""".stripMargin)),

    GraftQuery(
      "q_influxql_elapsed",
      "IQL25: ELAPSED(value, 1m) per tag — whole minutes between consecutive points",
      """WITH d AS (
        |  SELECT ts, user_id, event_id,
        |         epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id) AS dns
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03')
        |SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       dns // 60000000000 AS elapsed
        |FROM d WHERE dns IS NOT NULL ORDER BY user_id, ts, event_id""".stripMargin)(influx(
      """SELECT ELAPSED(value, 1m) AS elapsed FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-03'
        |GROUP BY user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_sample",
      "IQL26: SAMPLE(value, 2) per tag — deterministic LCG-rank pick (q_sample convention)",
      """WITH d AS (
        |  SELECT ts, user_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY (event_id * 1103515245 + 12345) % 2147483647, event_id) AS rk
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03')
        |SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       value AS sample
        |FROM d WHERE rk <= 2 ORDER BY user_id, rk""".stripMargin)(influx(
      """SELECT SAMPLE(value, 2) AS sample FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-03'
        |GROUP BY user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_holt",
      "IQL27: HOLT_WINTERS(MEAN(value), 2, 0) — 2-step Holt-linear forecast over hourly buckets",
      """WITH RECURSIVE a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT event_type, list(m ORDER BY t) AS vals, count(*) AS n, max(t) AS lastt
        |  FROM a GROUP BY event_type),
        |s(event_type, n, vals, lastt, i, l, b) AS (
        |  SELECT event_type, n, vals, lastt, CAST(3 AS BIGINT),
        |         vals[2]::DOUBLE, (vals[2] - vals[1])::DOUBLE
        |  FROM o WHERE n >= 2
        |  UNION ALL
        |  SELECT event_type, n, vals, lastt, i + 1,
        |         0.5 * vals[i] + 0.5 * (l + b),
        |         0.3 * ((0.5 * vals[i] + 0.5 * (l + b)) - l) + 0.7 * b
        |  FROM s WHERE i <= n),
        |f AS (SELECT event_type, lastt, l, b FROM s WHERE i = n + 1),
        |h AS (SELECT unnest(generate_series(1, 2)) AS h)
        |SELECT strftime(f.lastt + h.h * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS time,
        |       f.event_type, floor((f.l + h.h * f.b) * 10000) / 10000 AS hw
        |FROM f CROSS JOIN h ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT HOLT_WINTERS(MEAN(value), 2, 0) AS hw FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_holt_fit",
      "IQL70 (r9): HOLT_WINTERS_WITH_FIT(MEAN(value), 2, 0) — the in-sample fitted series " +
        "(first two buckets seed and fit themselves; later buckets fit the one-step " +
        "prediction l+b from the prior state) followed by the 2-step forecast",
      """WITH RECURSIVE a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT event_type, list(m ORDER BY t) AS vals, list(t ORDER BY t) AS ts_,
        |         count(*) AS n, max(t) AS lastt
        |  FROM a GROUP BY event_type),
        |s(event_type, n, vals, ts_, lastt, i, l, b) AS (
        |  SELECT event_type, n, vals, ts_, lastt, CAST(3 AS BIGINT),
        |         vals[2]::DOUBLE, (vals[2] - vals[1])::DOUBLE
        |  FROM o WHERE n >= 2
        |  UNION ALL
        |  SELECT event_type, n, vals, ts_, lastt, i + 1,
        |         0.5 * vals[i] + 0.5 * (l + b),
        |         0.3 * ((0.5 * vals[i] + 0.5 * (l + b)) - l) + 0.7 * b
        |  FROM s WHERE i <= n),
        |fits AS (
        |  SELECT strftime(ts_[1], '%Y-%m-%d %H:%M:%S') AS time, event_type,
        |         floor(vals[1] * 10000) / 10000 AS hwf
        |  FROM o WHERE n >= 1
        |  UNION ALL
        |  SELECT strftime(ts_[2], '%Y-%m-%d %H:%M:%S'), event_type,
        |         floor(vals[2] * 10000) / 10000
        |  FROM o WHERE n >= 2
        |  UNION ALL
        |  SELECT strftime(ts_[i], '%Y-%m-%d %H:%M:%S'), event_type,
        |         floor((l + b) * 10000) / 10000
        |  FROM s WHERE i <= n),
        |f AS (SELECT event_type, lastt, l, b FROM s WHERE i = n + 1),
        |h AS (SELECT unnest(generate_series(1, 2)) AS h),
        |fc AS (SELECT strftime(f.lastt + h.h * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS time,
        |              f.event_type, floor((f.l + h.h * f.b) * 10000) / 10000 AS hwf
        |       FROM f CROSS JOIN h)
        |SELECT time, event_type, hwf FROM fits
        |UNION ALL
        |SELECT time, event_type, hwf FROM fc
        |ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT HOLT_WINTERS_WITH_FIT(MEAN(value), 2, 0) AS hwf FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_star",
      "IQL28: SELECT * raw explore — all tags and fields with times",
      """SELECT strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type, user_id, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-10 06:00:00'
        |ORDER BY ts, event_id LIMIT 200""".stripMargin)(influx(
      """SELECT * FROM events
        |WHERE time >= '2024-01-10' AND time < '2024-01-10 06:00:00'
        |LIMIT 200""".stripMargin)),

    GraftQuery(
      "q_influxql_from_regex",
      "IQL29: FROM /re/ — regex measurement selection against the catalog",
      """SELECT event_type, count(value) AS n FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin)(influx(
      "SELECT COUNT(value) AS n FROM /^ev/ GROUP BY event_type")),

    GraftQuery(
      "q_influxql_limit_series",
      "IQL30: LIMIT/OFFSET on a grouped result paginate points PER SERIES (InfluxDB semantics)",
      """WITH a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn FROM a)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, event_type, m
        |FROM r WHERE rn > 2 AND rn <= 7 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT MEAN(value) AS m FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-04'
        |GROUP BY time(1h), event_type LIMIT 5 OFFSET 2""".stripMargin)),

    GraftQuery(
      "q_influxql_series",
      "IQL24: SHOW SERIES — distinct series keys in InfluxDB's measurement,tag=v format",
      """SELECT DISTINCT concat('events,event_type=', event_type,
        |                       ',user_id=', CAST(user_id AS VARCHAR)) AS key
        |FROM events ORDER BY key""".stripMargin)(influx(
      "SHOW SERIES FROM events")),

    GraftQuery(
      "q_influxql_regex",
      "IQL6: textual regex tag predicate `=~ /re/` + MEAN/COUNT per tag (InfluxQL regex selection)",
      """SELECT event_type, count(value) AS n, round(avg(value), 4) AS mean_value
        |FROM events WHERE regexp_matches(event_type, '^(cl|pu)')
        |GROUP BY event_type ORDER BY event_type""".stripMargin)(influx(
      """SELECT COUNT(value) AS n, MEAN(value) AS mean_value FROM events
        |WHERE event_type =~ /^(cl|pu)/
        |GROUP BY event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_cardinality",
      "IQL39 (r7): SHOW SERIES CARDINALITY — distinct-series count per measurement (partial+final count_distinct, one tiny shuffle)",
      """SELECT 'events' AS measurement,
        |       count(DISTINCT (event_type, user_id)) AS count
        |FROM events""".stripMargin)(influx(
      "SHOW SERIES CARDINALITY FROM events")),

    GraftQuery(
      "q_influxql_show_page",
      "IQL40 (r7): LIMIT/OFFSET on SHOW SERIES — paginated metadata listing (CollectLimit, no full materialization)",
      """SELECT key FROM (
        |  SELECT DISTINCT concat('events,event_type=', event_type,
        |                         ',user_id=', CAST(user_id AS VARCHAR)) AS key
        |  FROM events ORDER BY key LIMIT 7 OFFSET 3) t ORDER BY key""".stripMargin)(influx(
      "SHOW SERIES FROM events LIMIT 7 OFFSET 3")),

    GraftQuery(
      "q_influxql_rsi",
      "IQL44 (r7): textual RELATIVE_STRENGTH_INDEX(MEAN(value), 14) GROUP BY time(1h), tag — W10 through the parser",
      """WITH a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT user_id, t, m - lag(m) OVER (PARTITION BY user_id ORDER BY t) AS df
        |  FROM a),
        |g AS (
        |  SELECT user_id, t,
        |         avg(CASE WHEN df > 0 THEN df ELSE 0 END) OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS ag,
        |         avg(CASE WHEN df < 0 THEN -df ELSE 0 END) OVER (PARTITION BY user_id ORDER BY t
        |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS al
        |  FROM d WHERE df IS NOT NULL)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       CASE WHEN al = 0 THEN 100 ELSE round(100 - 100 / (1 + ag / al), 4) END AS rsi
        |FROM g ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT RELATIVE_STRENGTH_INDEX(MEAN(value), 14) AS rsi FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_cmo",
      "IQL45 (r7): textual CHANDE_MOMENTUM_OSCILLATOR(MEAN(value), 14) GROUP BY time(1h), tag — W11 through the parser",
      """WITH a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, t, m - lag(m) OVER (PARTITION BY event_type ORDER BY t) AS df
        |  FROM a),
        |g AS (
        |  SELECT event_type, t,
        |         sum(CASE WHEN df > 0 THEN df ELSE 0 END) OVER (PARTITION BY event_type ORDER BY t
        |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS su,
        |         sum(CASE WHEN df < 0 THEN -df ELSE 0 END) OVER (PARTITION BY event_type ORDER BY t
        |           ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS sd
        |  FROM d WHERE df IS NOT NULL)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, event_type,
        |       CASE WHEN su + sd = 0 THEN 0
        |            ELSE round(100 * (su - sd) / (su + sd), 4) + 0 END AS cmo
        |FROM g ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT CHANDE_MOMENTUM_OSCILLATOR(MEAN(value), 14) AS cmo FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_ker",
      "IQL46 (r7): textual KAUFMANS_EFFICIENCY_RATIO(MEAN(value), 10) GROUP BY time(1h), tag — W12 through the parser",
      """WITH a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, t,
        |         abs(m - lag(m) OVER (PARTITION BY event_type ORDER BY t)) AS adf,
        |         abs(m - lag(m, 10) OVER (PARTITION BY event_type ORDER BY t)) AS chg,
        |         row_number() OVER (PARTITION BY event_type ORDER BY t) AS rn
        |  FROM a),
        |g AS (
        |  SELECT event_type, t, chg, rn,
        |         sum(adf) OVER (PARTITION BY event_type ORDER BY t
        |           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol
        |  FROM d)
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, event_type,
        |       CASE WHEN vol = 0 THEN 0 ELSE round(chg / vol, 4) + 0 END AS ker
        |FROM g WHERE rn > 10 ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT KAUFMANS_EFFICIENCY_RATIO(MEAN(value), 10) AS ker FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),

    GraftQuery(
      "q_influxql_ema",
      "IQL47 (r7): textual EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) GROUP BY time(1h), tag — recursive bucket fold (HOLT_WINTERS pattern)",
      """WITH RECURSIVE a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, array_agg(m ORDER BY t) AS vals, array_agg(t ORDER BY t) AS ts_,
        |         count(*) AS n
        |  FROM a GROUP BY user_id),
        |s(user_id, vals, ts_, n, k, e) AS (
        |  SELECT user_id, vals, ts_, n, CAST(1 AS BIGINT), vals[1]::DOUBLE FROM o
        |  UNION ALL
        |  SELECT user_id, vals, ts_, n, k + 1,
        |         (CAST(2 AS DOUBLE) / 10) * vals[k + 1] + (1.0 - CAST(2 AS DOUBLE) / 10) * e
        |  FROM s WHERE k < n)
        |SELECT strftime(ts_[k], '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       floor(e * 10000) / 10000 AS ema
        |FROM s ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) AS ema FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_dema",
      "IQL69 (r9): DOUBLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) — 2·EMA − EMA(EMA), " +
        "the second fold re-runs the first fold's recursion over its output array",
      s"""$dEmaPrefix
         |SELECT strftime(ts_[k], '%Y-%m-%d %H:%M:%S') AS time, user_id,
         |       floor((2 * v1[k] - e) * 10000) / 10000 AS dema
         |FROM s2 ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT DOUBLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) AS dema FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_tema",
      "IQL69 (r9): TRIPLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) — 3·e1 − 3·e2 + e3 " +
        "over three chained EMA folds",
      s"""$dEmaPrefix
         |SELECT strftime(ts_[k], '%Y-%m-%d %H:%M:%S') AS time, user_id,
         |       floor((3 * v1[k] - 3 * v2[k] + e) * 10000) / 10000 AS tema
         |FROM s3 ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT TRIPLE_EXPONENTIAL_MOVING_AVERAGE(MEAN(value), 9) AS tema FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_trix",
      "IQL69 (r9): TRIPLE_EXPONENTIAL_DERIVATIVE(MEAN(value), 9) — percentage 1-bucket " +
        "rate of change of the triple EMA; the first bucket drops",
      s"""$dEmaPrefix,
         |o4 AS (SELECT user_id, ts_, n, array_agg(e ORDER BY k) AS v3
         |       FROM s3 GROUP BY user_id, ts_, n),
         |x AS (SELECT user_id, ts_, unnest(range(2, n + 1)) AS i, v3 FROM o4 WHERE n >= 2)
         |SELECT strftime(ts_[i], '%Y-%m-%d %H:%M:%S') AS time, user_id,
         |       floor(100 * (v3[i] - v3[i - 1]) / nullif(v3[i - 1], 0) * 10000) / 10000 AS trix
         |FROM x ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT TRIPLE_EXPONENTIAL_DERIVATIVE(MEAN(value), 9) AS trix FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_macd",
      "IQL71 (r10): MACD(MEAN(value), 12, 26) — the MACD line (fast EMA − slow EMA) " +
        "over the bucket grid, both recurrences fused in one fold (the EmaFamily " +
        "single-pass rule); first bucket = 0 exactly (both EMAs seed there)",
      """WITH RECURSIVE a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, array_agg(m ORDER BY t) AS vals,
        |         array_agg(t ORDER BY t) AS ts_, count(*) AS n
        |  FROM a GROUP BY user_id),
        |s(user_id, vals, ts_, n, k, ef, es, ml) AS (
        |  SELECT user_id, vals, ts_, n, CAST(1 AS BIGINT),
        |         vals[1]::DOUBLE, vals[1]::DOUBLE, 0.0::DOUBLE FROM o
        |  UNION ALL
        |  SELECT user_id, vals, ts_, n, k + 1,
        |         (CAST(2 AS DOUBLE) / 13) * vals[k + 1]
        |           + (1.0 - (CAST(2 AS DOUBLE) / 13)) * ef,
        |         (CAST(2 AS DOUBLE) / 27) * vals[k + 1]
        |           + (1.0 - (CAST(2 AS DOUBLE) / 27)) * es,
        |         ((CAST(2 AS DOUBLE) / 13) * vals[k + 1]
        |           + (1.0 - (CAST(2 AS DOUBLE) / 13)) * ef)
        |           - ((CAST(2 AS DOUBLE) / 27) * vals[k + 1]
        |           + (1.0 - (CAST(2 AS DOUBLE) / 27)) * es)
        |  FROM s WHERE k < n)
        |SELECT strftime(ts_[k], '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       floor(ml * 10000) / 10000 AS macd
        |FROM s ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT MACD(MEAN(value), 12, 26) AS macd FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_bollinger",
      "IQL72 (r10): BOLLINGER_WIDTH(MEAN(value), 5) — rolling-5-bucket band width " +
        "4σ/μ (k=2), the volatility-squeeze indicator; integer-scaled bucket values " +
        "make both engines' window sums exact regardless of summation order",
      """WITH a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |w AS (SELECT user_id, t, round(m * 10000)::BIGINT AS c FROM a),
        |f AS (SELECT user_id, t,
        |             count(*) OVER win AS n,
        |             sum(c)   OVER win AS s,
        |             sum(c*c) OVER win AS q
        |      FROM w WINDOW win AS (PARTITION BY user_id ORDER BY t
        |                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       CASE WHEN s / 50000.0 = 0.0 THEN 0.0
        |            ELSE round(4 * sqrt(greatest(
        |                   q / 500000000.0 - (s / 50000.0) * (s / 50000.0), 0.0))
        |                 / (s / 50000.0), 4) + 0 END AS bw
        |FROM f WHERE n = 5 ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT BOLLINGER_WIDTH(MEAN(value), 5) AS bw FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_zscore",
      "IQL73 (r11): ZSCORE(MEAN(value), 12) — rolling z-score over the last 12 " +
        "buckets, the live anomaly panel's normalized deviation (windowed sibling " +
        "of W6). Bollinger exactness recipe: integer-scaled bucket values make " +
        "both engines' window sums exact in any order; z is one fixed double " +
        "op-sequence (sample variance, n-1); incomplete windows drop; zero " +
        "variance reports 0.0 with the +0 fold",
      """WITH a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |w AS (SELECT user_id, t, round(m * 10000)::BIGINT AS c FROM a),
        |f AS (SELECT user_id, t, c,
        |             count(*) OVER win AS n,
        |             sum(c)   OVER win AS s,
        |             sum(c*c) OVER win AS q
        |      FROM w WINDOW win AS (PARTITION BY user_id ORDER BY t
        |                            ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT strftime(t, '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       CASE WHEN sqrt(greatest((q::DOUBLE - s::DOUBLE * s::DOUBLE / 12.0)
        |                               / 11.0, 0.0)) = 0.0 THEN 0.0
        |            ELSE round((c::DOUBLE - s::DOUBLE / 12.0)
        |                       / sqrt(greatest((q::DOUBLE - s::DOUBLE * s::DOUBLE / 12.0)
        |                                       / 11.0, 0.0)), 4) + 0 END AS z
        |FROM f WHERE n = 12 ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT ZSCORE(MEAN(value), 12) AS z FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_kama",
      "IQL69 (r9): KAUFMANS_ADAPTIVE_MOVING_AVERAGE(MEAN(value), 9) — er/sc from the KER " +
        "windows (first 9 buckets drop), then kama_k = kama_{k-1} + sc²·(v_k − kama_{k-1}) " +
        "seeded with the first surviving bucket; the square is spelled sc·sc for bit parity",
      """WITH RECURSIVE a AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |w1 AS (SELECT user_id, t, m,
        |              abs(m - lag(m) OVER pw) AS adf,
        |              abs(m - lag(m, 9) OVER pw) AS chg,
        |              row_number() OVER pw AS rn
        |       FROM a WINDOW pw AS (PARTITION BY user_id ORDER BY t)),
        |w2 AS (SELECT *, sum(adf) OVER (PARTITION BY user_id ORDER BY t
        |                                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS vol
        |       FROM w1),
        |e AS (SELECT user_id, t, m,
        |             CASE WHEN vol = 0 THEN 0.0 ELSE chg / vol END AS er
        |      FROM w2 WHERE rn > 9),
        |o AS (SELECT user_id, array_agg(m ORDER BY t) AS vals, array_agg(er ORDER BY t) AS ers,
        |             array_agg(t ORDER BY t) AS ts_, count(*) AS n
        |      FROM e GROUP BY user_id),
        |s(user_id, vals, ers, ts_, n, k, km) AS (
        |  SELECT user_id, vals, ers, ts_, n, CAST(1 AS BIGINT), vals[1]::DOUBLE FROM o
        |  UNION ALL
        |  SELECT user_id, vals, ers, ts_, n, k + 1,
        |         km + ((ers[k + 1] * ((CAST(2 AS DOUBLE) / 3) - (CAST(2 AS DOUBLE) / 31))
        |                 + (CAST(2 AS DOUBLE) / 31))
        |               * (ers[k + 1] * ((CAST(2 AS DOUBLE) / 3) - (CAST(2 AS DOUBLE) / 31))
        |                 + (CAST(2 AS DOUBLE) / 31)))
        |              * (vals[k + 1] - km)
        |  FROM s WHERE k < n)
        |SELECT strftime(ts_[k], '%Y-%m-%d %H:%M:%S') AS time, user_id,
        |       floor(km * 10000) / 10000 AS kama
        |FROM s ORDER BY time, user_id""".stripMargin)(influx(
      """SELECT KAUFMANS_ADAPTIVE_MOVING_AVERAGE(MEAN(value), 9) AS kama FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), user_id""".stripMargin)),

    GraftQuery(
      "q_influxql_field_select",
      "IQL62 (r9): field-NAME aggregates (`SELECT MEAN(click), COUNT(view) …`) — the " +
        "Grafana/Telegraf shape over a fieldTag catalog (the reference writes the alias " +
        "as the FIELD KEY, Linux/InfluxConnector2.py:222-240): each named field resolves " +
        "to a conditional projection of the value column, null on other fields' rows",
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS time,
        |       round(avg(CASE WHEN event_type = 'click' THEN value END), 4) AS m_click,
        |       count(CASE WHEN event_type = 'view' THEN value END) AS n_view,
        |       round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS s_error
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  AND event_type IN ('click', 'view', 'error')
        |GROUP BY 1 ORDER BY time""".stripMargin) { (s, dir) =>
      // events with the event_type column PLAYING the field-key role —
      // exactly how the reference's daemon writes (field key = alias)
      val cat = InfluxQLPlanner.Catalog(Seq("events"), Seq("event_type"), "value",
        load = (ss, d, _) => graft.tables.Tables.events(ss, d),
        fieldTag = Some("event_type"))
      InfluxQLPlanner.sql(s, dir,
        """SELECT MEAN(click) AS m_click, COUNT(view) AS n_view, SUM(error) AS s_error
          |FROM events
          |WHERE time >= '2024-01-01' AND time < '2024-01-08'
          |GROUP BY time(1d)""".stripMargin, catalog = cat)
    },

    GraftQuery(
      "q_influxql_field_where",
      "IQL65 (r9): field-VALUE predicates in WHERE (`SELECT MEAN(click) … WHERE click > 90`) " +
        "— the Grafana threshold shape over a fieldTag catalog: the cond waits for the " +
        "conditional field projection (the raw scan has no such column) while tag/time " +
        "conds keep their parquet pushdown",
      """SELECT strftime(time_bucket(INTERVAL '1 day', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS time,
        |       round(avg(value), 4) AS m_click, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  AND event_type = 'click' AND value > 90
        |GROUP BY 1 ORDER BY time""".stripMargin) { (s, dir) =>
      val cat = InfluxQLPlanner.Catalog(Seq("events"), Seq("user_id"), "value",
        load = (ss, d, _) => graft.tables.Tables.events(ss, d),
        fieldTag = Some("event_type"))
      InfluxQLPlanner.sql(s, dir,
        """SELECT MEAN(click) AS m_click, COUNT(click) AS n
          |FROM events
          |WHERE time >= '2024-01-01' AND time < '2024-01-08' AND click > 90
          |GROUP BY time(1d)""".stripMargin, catalog = cat)
    },

    GraftQuery(
      "q_influxql_tag_dynamic",
      "IQL66 (r9): DYNAMIC tag sets — WHERE and GROUP BY keys resolved against a JSON " +
        "tag-set column (the store's Telegraf `cpu,host=a` dimensions): `GROUP BY k` " +
        "materializes element_at(tags, 'k') up front, `k != '50'` filters it, and the " +
        "whole agg/render path downstream sees a plain column",
      """SELECT json_extract_string(props, '$.k') AS k,
        |       round(sum(value), 2) AS s, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  AND json_extract_string(props, '$.k') != '50'
        |GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
      val cat = InfluxQLPlanner.Catalog(Seq("events"), Seq("event_type"), "value",
        load = (ss, d, _) => graft.tables.Tables.events(ss, d),
        tagsJson = Some("props"))
      InfluxQLPlanner.sql(s, dir,
        """SELECT SUM(value) AS s, COUNT(value) AS n FROM events
          |WHERE time >= '2024-01-01' AND time < '2024-01-08' AND k != '50'
          |GROUP BY k""".stripMargin, catalog = cat)
    },

    GraftQuery(
      "q_influxql_subsecond",
      "IQL67 (r9): sub-second GROUP BY time(250ms, 100ms) — durations are ns-native through " +
        "the whole lexer→AST→planner path (InfluxDB 1.x's full unit set ns/u/µ/ms/s/m/h/d/w); " +
        "buckets stay exact integer arithmetic on ts_ns and render at the store's µs precision",
      """SELECT strftime(make_timestamp(
        |         ((epoch_us(ts) - 100000) // 250000) * 250000 + 100000),
        |         '%Y-%m-%d %H:%M:%S.%f') AS time,
        |       round(avg(value), 4) AS mean_value, count(value) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-01 06:00:00'
        |GROUP BY 1 ORDER BY time""".stripMargin)(influx(
      """SELECT MEAN(value) AS mean_value, COUNT(value) AS n FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-01T06:00:00Z'
        |GROUP BY time(250ms, 100ms)""".stripMargin)),

    GraftQuery(
      "q_influxql_holt_seasonal",
      "IQL68 (r9): HOLT_WINTERS(MEAN(value), 4, 24) — additive SEASONAL (triple-exponential) " +
        "forecast, daily seasonality over hourly buckets; per-series fold state is " +
        "(l, b, S-slot seasonal array), bounded by the bucket grid — fixed α/β/γ keep the " +
        "fold bit-identical to the recursive-CTE oracle",
      """WITH RECURSIVE a AS (
        |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |         round(avg(value), 4) AS m
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT event_type, list(m ORDER BY t) AS vals, count(*) AS n, max(t) AS lastt
        |  FROM a GROUP BY event_type),
        |s(event_type, n, vals, lastt, i, l, b, sa) AS (
        |  SELECT event_type, n, vals, lastt, CAST(25 AS BIGINT),
        |         vals[24]::DOUBLE,
        |         ((vals[24] - vals[1]) / 23.0)::DOUBLE,
        |         list_transform(vals[1:24], v -> (v - vals[24])::DOUBLE)
        |  FROM o WHERE n >= 25
        |  UNION ALL
        |  SELECT event_type, n, vals, lastt, i + 1,
        |         0.5 * (vals[i] - sa[((i - 1) % 24) + 1]) + 0.5 * (l + b),
        |         0.3 * ((0.5 * (vals[i] - sa[((i - 1) % 24) + 1]) + 0.5 * (l + b)) - l)
        |           + 0.7 * b,
        |         list_transform(sa, (v, j) -> CASE WHEN j = ((i - 1) % 24) + 1
        |           THEN 0.2 * (vals[i] - (0.5 * (vals[i] - sa[((i - 1) % 24) + 1])
        |                  + 0.5 * (l + b))) + 0.8 * v
        |           ELSE v END)
        |  FROM s WHERE i <= n),
        |f AS (SELECT event_type, n, lastt, l, b, sa FROM s WHERE i = n + 1),
        |h AS (SELECT unnest(generate_series(1, 4)) AS h)
        |SELECT strftime(f.lastt + h.h * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS time,
        |       f.event_type,
        |       floor((f.l + h.h * f.b + f.sa[((f.n + h.h - 1) % 24) + 1]) * 10000) / 10000 AS hw
        |FROM f CROSS JOIN h ORDER BY time, event_type""".stripMargin)(influx(
      """SELECT HOLT_WINTERS(MEAN(value), 4, 24) AS hw FROM events
        |WHERE time >= '2024-01-01' AND time < '2024-01-08'
        |GROUP BY time(1h), event_type""".stripMargin)),
  )
}
