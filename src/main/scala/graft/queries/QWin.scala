package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraftQuery
import Q._

/** Window functions — SURVEY.md §2.5 (W1-W6): the InfluxQL per-series
  * transforms (LAST/DERIVATIVE/MOVING_AVERAGE/TOP/CUMULATIVE_SUM, ref
  * README.md:3) plus z-score anomaly detection.
  *
  * Every window partitions by the series key (user_id / event_type), so the
  * single shuffle is on the series key — exactly the partitioning a 100 TB
  * time-series table would already be bucketed by; with bucketing in place
  * these become shuffle-free. ORDER BY inside each window is tie-broken by
  * event_id so results are deterministic under parallel execution.
  */
object QWin {

  // Per-series event-time window, deterministic tie-break.
  private def w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
  private val duckW = "PARTITION BY user_id ORDER BY ts, event_id"

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_win_last",
      "W1/T8: running last non-null per series (the m_value cache, ref InfluxConnector2.py:53,173)",
      s"""SELECT event_id, user_id,
         |       last_value(CASE WHEN value >= 50 THEN value END IGNORE NULLS)
         |         OVER ($duckW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("last_seen",
          last(when(col("value") >= 50, col("value")), ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("event_id", "user_id", "last_seen")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_derivative",
      "W2: DERIVATIVE — dvalue/dt per series (InfluxQL, README.md:3)",
      s"""SELECT event_id, user_id,
         |       round((value - lag(value) OVER ($duckW))
         |             / ((epoch_us(ts) - lag(epoch_us(ts)) OVER ($duckW)) / 1000000.0), 6) + 0 AS deriv
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val dv = col("value") - lag(col("value"), 1).over(w)
      val dt = (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)) / lit(1000000.0)
      events(s, dir)
        // `+ 0` folds IEEE -0.0 (from rounding tiny negatives) to +0.0 in
        // both engines — keeps hash parity.
        .withColumn("deriv", round(dv / dt, 6) + lit(0.0))
        .select("event_id", "user_id", "deriv")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_movavg",
      "W3: MOVING_AVERAGE(3) with an explicit rows frame (InfluxQL, README.md:3)",
      s"""SELECT event_id, user_id,
         |       round(avg(value) OVER ($duckW ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("ma3", round(avg(col("value")).over(w.rowsBetween(-2, Window.currentRow)), 4))
        .select("event_id", "user_id", "ma3")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_topk_per_group",
      "W4: TOP(k) per series via row_number (InfluxQL TOP/BOTTOM, README.md:3)",
      """SELECT event_type, event_id, value,
        |       row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        |FROM events
        |QUALIFY rn <= 5 ORDER BY event_type, rn""".stripMargin) { (s, dir) =>
      val wk = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
      events(s, dir)
        .withColumn("rn", row_number().over(wk))
        .filter(col("rn") <= 5)
        .select("event_type", "event_id", "value", "rn")
        .orderBy("event_type", "rn")
    },

    GraftQuery(
      "q_win_cumsum",
      "W5: CUMULATIVE_SUM per series (counter totalization, InfluxQL README.md:3)",
      s"""SELECT event_id, user_id,
         |       round(sum(value) OVER ($duckW ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS csum
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("csum",
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .select("event_id", "user_id", "csum")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_difference",
      "W7: DIFFERENCE — per-series delta between consecutive samples (InfluxQL, README.md:3)",
      s"""SELECT event_id, user_id,
         |       round(value - lag(value) OVER ($duckW), 2) + 0 AS diff
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("diff", round(col("value") - lag(col("value"), 1).over(w), 2) + lit(0.0))
        .select("event_id", "user_id", "diff")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_elapsed",
      "W8: ELAPSED — microseconds between consecutive samples per series (InfluxQL, README.md:3)",
      s"""SELECT event_id, user_id,
         |       epoch_us(ts) - lag(epoch_us(ts)) OVER ($duckW) AS elapsed_us
         |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("elapsed_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .select("event_id", "user_id", "elapsed_us")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_zscore",
      "W6: per-series z-score — anomaly detection on stored series (README.md:3)",
      """SELECT event_id, event_type,
        |       round((value - avg(value) OVER (PARTITION BY event_type))
        |             / stddev_samp(value) OVER (PARTITION BY event_type), 3) + 0 AS z
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wz = Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, dir)
        .withColumn("z",
          round((col("value") - avg(col("value")).over(wz)) / stddev_samp(col("value")).over(wz), 3)
            + lit(0.0))
        .select("event_id", "event_type", "z")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_autocorr",
      "Extension: lag-1 autocorrelation per series — the periodicity/trend signal (a value " +
        "near 0 means the series is noise, near 1 means momentum). One window shuffle for " +
        "the lag, one aggregate for Pearson r over the (v, prev) pairs",
      """WITH l AS (SELECT event_type, value,
        |                  lag(value) OVER (PARTITION BY event_type
        |                                   ORDER BY ts, event_id) AS prev
        |           FROM events)
        |SELECT event_type, count(prev)::BIGINT AS n_pairs,
        |       round(corr(value, prev), 4) AS r1
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val wl = Window.partitionBy("event_type").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("prev", lag(col("value"), 1).over(wl))
        .groupBy("event_type")
        .agg(count(col("prev")).as("n_pairs"), round(corr(col("value"), col("prev")), 4).as("r1"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_win_rolling_median",
      "Extension: rolling 5-point median per series — the robust smoother (a moving average " +
        "chases the spikes a rolling median ignores). Medians run over integer cents so both " +
        "engines' even-count interpolation is exactly representable; one window shuffle on " +
        "the series key, same frame mechanics as MOVING_AVERAGE",
      """SELECT event_id, event_type,
        |       round(median(round(value * 100)::BIGINT)
        |               OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) / 100, 4) AS med5
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wm = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      events(s, dir)
        .withColumn("v100", round(col("value") * 100, 0).cast("long"))
        .withColumn("med5", round(expr(Q.pctl(s, "v100", "0.5D"))
          .over(wm) / 100, 4))
        .select("event_id", "event_type", "med5")
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_bollinger",
      "Extension (r10): Bollinger bands — rolling 5-point mean ± 2σ per series with " +
        "breakout flags, the volatility envelope TA dashboards draw around " +
        "MOVING_AVERAGE (completing the TA set next to RSI/CMO/KER). All window " +
        "sums run over integer cents (Σc and Σc² exact in both engines), the full " +
        "window pins n=5 so every band is one fixed double op-sequence from exact " +
        "integers — the q_embedding_outliers determinism recipe; breakouts compare " +
        "those same deterministic doubles, so no FP boundary flips a flag.",
      """WITH b AS (SELECT event_id, event_type, ts,
        |                  round(value * 100)::BIGINT AS c FROM events),
        |w AS (SELECT event_id, event_type, c,
        |             count(*) OVER win AS n,
        |             sum(c)   OVER win AS s,
        |             sum(c*c) OVER win AS q
        |      FROM b WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type,
        |       round(c / 100.0, 4) AS v,
        |       round(s / 500.0, 4) AS mid,
        |       round(s / 500.0 + 2 * sqrt(greatest(
        |             q / 50000.0 - (s / 500.0) * (s / 500.0), 0.0)), 4) AS upper,
        |       round(s / 500.0 - 2 * sqrt(greatest(
        |             q / 50000.0 - (s / 500.0) * (s / 500.0), 0.0)), 4) + 0 AS lower,
        |       (c / 100.0 > s / 500.0 + 2 * sqrt(greatest(
        |             q / 50000.0 - (s / 500.0) * (s / 500.0), 0.0))
        |        OR c / 100.0 < s / 500.0 - 2 * sqrt(greatest(
        |             q / 50000.0 - (s / 500.0) * (s / 500.0), 0.0))) AS breakout
        |FROM w WHERE n = 5 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      val cs = col("s").cast("double"); val cq = col("q").cast("double")
      val mid = cs / 500.0
      val sd = sqrt(greatest(cq / 50000.0 - (cs / 500.0) * (cs / 500.0), lit(0.0)))
      val cv = col("c").cast("double") / 100.0
      events(s, dir)
        .withColumn("c", round(col("value") * 100, 0).cast("long"))
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("s", sum(col("c")).over(win))
        .withColumn("q", sum(col("c") * col("c")).over(win))
        .filter(col("n") === 5)
        .select(col("event_id"), col("event_type"),
          round(cv, 4).as("v"),
          round(mid, 4).as("mid"),
          round(mid + lit(2) * sd, 4).as("upper"),
          (round(mid - lit(2) * sd, 4) + lit(0.0)).as("lower"),
          (cv > mid + lit(2) * sd || cv < mid - lit(2) * sd).as("breakout"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_win_stochastic",
      "Extension (r10): stochastic oscillator — %K = position of the latest sample " +
        "inside its rolling 5-point [min, max] range, %D = 3-period SMA of %K, the " +
        "momentum pair next to RSI/Bollinger on a TA panel. Integer-cents min/max " +
        "make %K one exact-input division; %D is spelled as an EXPLICIT " +
        "(lag2 + lag1 + k) / 3 chain, not a window avg, so both engines add the " +
        "same three doubles in the same order. Flat windows (max = min) define " +
        "%K = 0; %D rows require all three contributing %K rows fully formed.",
      """WITH b AS (SELECT event_id, event_type, ts,
        |                  round(value * 100)::BIGINT AS c FROM events),
        |w AS (SELECT event_id, event_type, ts, c,
        |             count(*) OVER win AS n,
        |             min(c) OVER win AS mn,
        |             max(c) OVER win AS mx
        |      FROM b WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |                            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |k AS (SELECT event_id, event_type, ts, n,
        |             CASE WHEN mx > mn THEN 100.0 * (c - mn) / (mx - mn)
        |                  ELSE 0.0 END AS pk
        |      FROM w),
        |d AS (SELECT event_id, event_type, n, pk,
        |             lag(pk, 1) OVER w2 AS p1, lag(pk, 2) OVER w2 AS p2,
        |             lag(n, 2) OVER w2 AS n2
        |      FROM k WINDOW w2 AS (PARTITION BY event_type ORDER BY ts, event_id))
        |SELECT event_id, event_type, round(pk, 4) AS pct_k,
        |       round((p2 + p1 + pk) / 3.0, 4) AS pct_d
        |FROM d WHERE n = 5 AND n2 = 5 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      val w2 = Window.partitionBy("event_type").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("c", round(col("value") * 100, 0).cast("long"))
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("mn", min(col("c")).over(win))
        .withColumn("mx", max(col("c")).over(win))
        .withColumn("pk", when(col("mx") > col("mn"),
          lit(100.0) * (col("c") - col("mn")) / (col("mx") - col("mn")))
          .otherwise(lit(0.0)))
        .withColumn("p1", lag(col("pk"), 1).over(w2))
        .withColumn("p2", lag(col("pk"), 2).over(w2))
        .withColumn("n2", lag(col("n"), 2).over(w2))
        .filter(col("n") === 5 && col("n2") === 5)
        .select(col("event_id"), col("event_type"),
          round(col("pk"), 4).as("pct_k"),
          round((col("p2") + col("p1") + col("pk")) / 3.0, 4).as("pct_d"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_gap_report",
      "Extension: series gap/offline detection — report intervals where a series went " +
        "silent for > 24 h (the 'PLC stopped reporting' monitoring query). One window " +
        "shuffle for the lag, then a filter; the report is tiny regardless of corpus size",
      """SELECT event_id, user_id,
        |       strftime(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |                '%Y-%m-%d %H:%M:%S') AS gap_start,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
        |       epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |         AS gap_us
        |FROM events
        |QUALIFY gap_us > 86400000000 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wg))
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .filter(col("gap_us") > 86400000000L)
        .select(col("event_id"), col("user_id"),
          tsS(col("prev_ts")).as("gap_start"), tsS(col("ts")).as("gap_end"), col("gap_us"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_xcorr",
      "Extension: lagged cross-correlation between two series — does click activity " +
        "predict purchases 0-3 hours later? Hourly counts first (the aggregate bounds the " +
        "series to the dashboard grid, so the single-partition lead window is over ~10² " +
        "rows, not raw events), then one stack/unpivot and a per-lag Pearson aggregate",
      """WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t,
        |                  count(*) FILTER (WHERE event_type = 'click') AS c,
        |                  count(*) FILTER (WHERE event_type = 'purchase') AS p
        |           FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |l AS (SELECT t, c, p,
        |             lead(p, 1) OVER (ORDER BY t) AS p1,
        |             lead(p, 2) OVER (ORDER BY t) AS p2,
        |             lead(p, 3) OVER (ORDER BY t) AS p3 FROM b),
        |u AS (SELECT 0 AS lag, c, p AS pl FROM l
        |      UNION ALL SELECT 1, c, p1 FROM l
        |      UNION ALL SELECT 2, c, p2 FROM l
        |      UNION ALL SELECT 3, c, p3 FROM l)
        |SELECT lag, count(pl) AS n_pairs, round(corr(c, pl), 4) AS r
        |FROM u GROUP BY lag ORDER BY lag""".stripMargin) { (s, dir) =>
      val b = events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(when(col("event_type") === "click", 1)).as("c"),
          count(when(col("event_type") === "purchase", 1)).as("p"))
        .select(col("window.start").as("t"), col("c"), col("p"))
      val wx = Window.orderBy("t")
      b.withColumn("p1", lead(col("p"), 1).over(wx))
        .withColumn("p2", lead(col("p"), 2).over(wx))
        .withColumn("p3", lead(col("p"), 3).over(wx))
        .selectExpr("stack(4, 0, c, p, 1, c, p1, 2, c, p2, 3, c, p3) AS (lag, c2, pl)")
        .groupBy("lag")
        .agg(count(col("pl")).as("n_pairs"), round(corr(col("c2"), col("pl")), 4).as("r"))
        .orderBy("lag")
    },

    GraftQuery(
      "q_dwell_time",
      "Extension: state dwell times — how long each series stayed in each state before " +
        "changing (the state-machine metric behind 'machine ran 4 h, idled 20 min'): " +
        "gap-and-islands over state CHANGES (lag + running change-count), then one " +
        "aggregate per run. One window shuffle on the series key, runs ≪ samples",
      """WITH x AS (SELECT user_id, event_type, ts, event_id,
        |                  CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |                       THEN 1 ELSE 0 END AS chg
        |           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |i AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS run_id
        |      FROM x)
        |SELECT user_id, CAST(run_id AS BIGINT) AS run_id, min(event_type) AS state,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end,
        |       epoch_us(max(ts)) - epoch_us(min(ts)) AS dwell_us, count(*) AS n
        |FROM i GROUP BY user_id, run_id ORDER BY user_id, run_id""".stripMargin) { (s, dir) =>
      val wd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wc = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("chg",
          when(!(lag(col("event_type"), 1).over(wd) <=> col("event_type")), 1).otherwise(0))
        .withColumn("run_id", sum(col("chg")).over(wc))
        .groupBy("user_id", "run_id")
        .agg(min(col("event_type")).as("state"),
          tsS(min(col("ts"))).as("t_start"), tsS(max(col("ts"))).as("t_end"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dwell_us"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("run_id").cast("bigint").as("run_id"), col("state"),
          col("t_start"), col("t_end"), col("dwell_us"), col("n"))
        .orderBy("user_id", "run_id")
    },

    GraftQuery(
      "q_markov_transitions",
      "W14 (r9): state-transition probability matrix — P(next state | current state) across " +
        "all series, the Markov-chain summary of the fleet's state machine (which states " +
        "follow 'error'? is 'purchase' reachable from 'view'?). One window shuffle for the " +
        "per-series lag, pair counts collapse map-side, per-state totals are a k-row " +
        "broadcast join (k = distinct states — tiny at any scale).",
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, event_type AS next, count(*) AS n
        |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev, sum(n)::BIGINT AS tot FROM c GROUP BY 1)
        |SELECT c.prev, c.next, c.n, t.tot, round(c.n::DOUBLE / t.tot, 4) AS p
        |FROM c JOIN t USING (prev) ORDER BY prev, next""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val c = events(s, dir)
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("prev"), col("event_type").as("next"))
        .groupBy("prev", "next")
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy("prev").agg(sum(col("n")).as("tot"))
      c.join(broadcast(t), Seq("prev"))
        .select(col("prev"), col("next"), col("n"), col("tot"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy("prev", "next")
    },

    GraftQuery(
      "q_sessionize",
      "W15 (r9): batch sessionization — split each series into activity sessions at >6h " +
        "inactivity gaps, emit per-session stats (the batch twin of q_stream_session's " +
        "streaming session window; same semantics, replayable over history). Classic " +
        "gap-and-islands: lag flags session starts, a running sum numbers them, one " +
        "aggregate per session — all three steps reuse the SAME user_id window/grouping " +
        "partitioning, so the whole query is one shuffle of the scan.",
      """WITH s AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                ORDER BY ts, event_id) > 21600000000 OR
        |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |g AS (SELECT user_id, ts, event_id,
        |             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                              ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM s),
        |f AS (SELECT user_id, sess::BIGINT AS session_id, count(*) AS n_events,
        |             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS t_start,
        |             strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS t_end,
        |             (max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS dur_s
        |      FROM g GROUP BY user_id, sess)
        |SELECT * FROM f ORDER BY user_id, session_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("new_s",
          when(lag(col("us"), 1).over(w).isNull ||
               col("us") - lag(col("us"), 1).over(w) > 21600000000L, 1).otherwise(0))
        .withColumn("sess", sum(col("new_s")).over(wRun))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"),
          tsS(min(col("ts"))).as("t_start"),
          tsS(max(col("ts"))).as("t_end"),
          ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("bigint").as("dur_s"))
        .select(col("user_id"), col("sess").cast("bigint").as("session_id"),
          col("n_events"), col("t_start"), col("t_end"), col("dur_s"))
        .orderBy("user_id", "session_id")
    },

    GraftQuery(
      "q_lag_features",
      "W16 (r9): supervised feature materialization — per (series, t) row emit lag-1/lag-2, " +
        "rolling 5-point mean/std, and the NEXT value as the forecast target: the training-" +
        "set constructor for per-series forecasting models. Every feature and the target " +
        "ride ONE (user_id, ts) window partitioning — a single shuffle materializes the " +
        "whole feature matrix; warm-up rows (rn < 5) and the last row of each series " +
        "(no target) are dropped so every emitted row is a complete training example. " +
        "round(4) absorbs cross-engine avg/stddev summation ulps.",
      """WITH f AS (
        |  SELECT event_id, user_id, value,
        |         row_number() OVER w AS rn,
        |         lag(value, 1) OVER w AS lag1,
        |         lag(value, 2) OVER w AS lag2,
        |         round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
        |           AS roll_mean5,
        |         round(stddev_samp(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
        |           AS roll_std5,
        |         lead(value, 1) OVER w AS target
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id, value, lag1, lag2, roll_mean5, roll_std5, target
        |FROM f WHERE rn >= 5 AND target IS NOT NULL ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-4, Window.currentRow)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("lag1", lag(col("value"), 1).over(w))
        .withColumn("lag2", lag(col("value"), 2).over(w))
        .withColumn("roll_mean5", round(avg(col("value")).over(wf), 4))
        .withColumn("roll_std5", round(stddev_samp(col("value")).over(wf), 4))
        .withColumn("target", lead(col("value"), 1).over(w))
        .filter(col("rn") >= 5 && col("target").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"), col("lag1"), col("lag2"),
          col("roll_mean5"), col("roll_std5"), col("target"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_model_feed",
      "Extension (r10): the composed model-feed pipeline — per-row supervised features " +
        "(q_lag_features), per-series CUSUM drift state (q_cusum's streaming fold), and " +
        "batch liveness (the deadman's silent-for / stale flag vs the corpus watermark) " +
        "in ONE training-ready frame. Every branch partitions on the SAME key (the " +
        "user_id window, the Cusum repartition, the per-series join), so the feature " +
        "matrix, drift labels, and liveness ride one co-partitioned plan; the corpus " +
        "watermark is a driver-side scalar (scalar subqueries plan the audit-banned " +
        "BNLJ). The composition pattern of q_pipeline_trainset applied to the " +
        "time-series stack.",
      """WITH RECURSIVE o AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS vals, count(*) AS n
        |  FROM events GROUP BY user_id),
        |s(user_id, n, vals, i, sp, sn, alarms) AS (
        |  SELECT user_id, n, vals, CAST(0 AS BIGINT), 0.0::DOUBLE, 0.0::DOUBLE, CAST(0 AS BIGINT)
        |  FROM o
        |  UNION ALL
        |  SELECT user_id, n, vals, i + 1,
        |         greatest(0.0, sp + (vals[i + 1] - 50.0) - 2.0),
        |         greatest(0.0, sn - (vals[i + 1] - 50.0) - 2.0),
        |         alarms + CASE WHEN greatest(0.0, sp + (vals[i + 1] - 50.0) - 2.0) > 100.0
        |                         OR greatest(0.0, sn - (vals[i + 1] - 50.0) - 2.0) > 100.0
        |                       THEN 1 ELSE 0 END
        |  FROM s WHERE i < n),
        |drift AS (SELECT user_id, floor(sp * 10000) / 10000 AS cusum_pos, alarms
        |          FROM s WHERE i = n),
        |x AS (SELECT max(ts) AS mx FROM events),
        |f AS (
        |  SELECT event_id, user_id, value,
        |         row_number() OVER w AS rn,
        |         lag(value, 1) OVER w AS lag1,
        |         round(avg(value) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)
        |           AS roll_mean5,
        |         lead(value, 1) OVER w AS target,
        |         max(ts) OVER (PARTITION BY user_id) AS last_seen
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT f.event_id, f.user_id, f.value, f.lag1, f.roll_mean5, f.target,
        |       d.cusum_pos, d.alarms AS drift_alarms,
        |       (epoch_us((SELECT mx FROM x)) - epoch_us(f.last_seen)) // 1000000 AS silent_s,
        |       epoch_us((SELECT mx FROM x)) - epoch_us(f.last_seen) > 86400000000 AS stale
        |FROM f JOIN drift d USING (user_id)
        |WHERE f.rn >= 5 AND f.target IS NOT NULL
        |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
      val ev = events(s, dir)
      // the corpus watermark: one driver-side long (Q.scala scalar rule)
      val mxUs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wf = w.rowsBetween(-4, Window.currentRow)
      val wSeries = Window.partitionBy("user_id")
      val feats = ev
        .withColumn("rn", row_number().over(w))
        .withColumn("lag1", lag(col("value"), 1).over(w))
        .withColumn("roll_mean5", round(avg(col("value")).over(wf), 4))
        .withColumn("target", lead(col("value"), 1).over(w))
        .withColumn("last_seen", max(col("ts")).over(wSeries))
        .filter(col("rn") >= 5 && col("target").isNotNull)
      val drift = graft.functions.Cusum.cusumByKey(
          ev.select(col("user_id"), col("ts_ns"), col("event_id"), col("value")),
          target = 50.0, slack = 2.0, band = 100.0)
        .toDF()
        .select(col("user_id").as("d_uid"),
          (floor(col("cusum_pos") * 10000) / 10000).as("cusum_pos"),
          col("alarms").as("drift_alarms"))
      feats.join(drift, col("user_id") === col("d_uid"))
        .select(col("event_id"), col("user_id"), col("value"), col("lag1"),
          col("roll_mean5"), col("target"), col("cusum_pos"), col("drift_alarms"),
          ((lit(mxUs) - unix_micros(col("last_seen"))) / lit(1000000L)).cast("bigint")
            .as("silent_s"),
          (lit(mxUs) - unix_micros(col("last_seen")) > 86400000000L).as("stale"))
        .orderBy("event_id")
    },
  )
}
