package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import Q._

/** Streaming operators' batch twins — SURVEY.md §2.9 (T4/T5/T6/T9).
  *
  * Each plan here is written against a plain DataFrame so the identical
  * function runs over a Structured Streaming input (see
  * graft.streaming.Pipelines and StreamingParitySpec, which feed these via
  * MemoryStream and assert batch/stream parity). The oracle checks the
  * batch twin; the streaming path adds only watermarking.
  */
object QStream {

  /** T4: tumbling 10-minute count/avg per event_type (InfluxQL GROUP BY
    * time). The mean truncates via floor(x*1e4)/1e4 rather than round():
    * round-on-double at an exact half-point boundary differs between
    * engines (seen at sf0.1 — 3 of 8016 buckets), truncation never does
    * (q_fill_linear convention).
    */
  def tumbling(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (floor(avg("value") * 10000) / 10000).as("mean_value"))
      .select(tsS(col("window.start")).as("ws"), col("event_type"), col("n"), col("mean_value"))

  /** T5: sliding 10-minute window every 5 minutes. */
  def sliding(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(tsS(col("window.start")).as("ws"), col("event_type"), col("n"))

  /** T6: session windows with a 30-minute inactivity gap, per user. */
  def session(df: DataFrame): DataFrame =
    df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), tsS(col("session_window.start")).as("session_start"),
        tsS(col("session_window.end")).as("session_end"), col("n"))

  /** T9: exact dedup keeping the first (min event_id) row per key —
    * deterministic, unlike dropDuplicates' arbitrary keeper. Streaming twin
    * is dropDuplicatesWithinWatermark (see Pipelines).
    */
  def dedup(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    df.withColumn("rn", row_number().over(wk))
      .filter(col("rn") === 1)
      .select("event_id", "user_id", "event_type", "value")
  }

  /** T8: write-on-change — emit a row only when the series' value band
    * (floor(value/100)) differs from the previous sample's. This is the
    * "only write when the reading moved" reasoning the reference's m_value
    * cache exists for (Linux/InfluxConnector2.py:53,173). Batch twin of
    * the flatMapGroupsWithState pipeline in graft.streaming.Pipelines.
    */
  def changeBands(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    df.withColumn("band", floor(col("value") / 100).cast("long"))
      .withColumn("pband", lag(col("band"), 1).over(wk))
      .filter(col("pband").isNull || col("band") =!= col("pband"))
      .select("event_id", "user_id", "band")
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_stream_tumbling",
      "T4: tumbling-window agg, batch twin (streaming parity asserted in StreamingParitySpec)",
      """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
        |       event_type, count(*) AS n, floor(avg(value) * 10000) / 10000 AS mean_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      tumbling(events(s, dir)).orderBy("ws", "event_type")
    },

    GraftQuery(
      "q_stream_sliding",
      "T5: sliding-window agg (10m window, 5m slide), batch twin",
      """SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS ws, event_type, count(*) AS n
        |FROM (
        |  SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) AS s, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) - INTERVAL '5 minutes', event_type FROM events
        |) GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      sliding(events(s, dir)).orderBy("ws", "event_type")
    },

    GraftQuery(
      "q_stream_session",
      "T6: session windows (30m gap) per user; oracle = gap-and-island SQL",
      """WITH x AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT user_id,
        |       strftime(min(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts)::TIMESTAMP + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
        |       count(*) AS n
        |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      session(events(s, dir)).orderBy("user_id", "session_start")
    },

    GraftQuery(
      "q_change_detect",
      "T8: write-on-change per series (the m_value cache purpose, ref InfluxConnector2.py:53,173); streaming twin = flatMapGroupsWithState",
      """SELECT event_id, user_id, band FROM (
        |  SELECT event_id, user_id,
        |         CAST(floor(value / 100) AS BIGINT) AS band,
        |         lag(CAST(floor(value / 100) AS BIGINT))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pband
        |  FROM events)
        |WHERE pband IS NULL OR band <> pband ORDER BY event_id""".stripMargin) { (s, dir) =>
      changeBands(events(s, dir)).orderBy("event_id")
    },

    GraftQuery(
      "q_dedup",
      "T9: exact dedup, deterministic keeper (min event_id per key); streaming twin = dropDuplicatesWithinWatermark",
      """SELECT event_id, user_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) = 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      dedup(events(s, dir)).orderBy("event_id")
    },
  )
}
