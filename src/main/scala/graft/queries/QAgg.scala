package graft.queries

import org.apache.spark.sql.functions._
import graft.GraftQuery
import Q._

/** Aggregations — SURVEY.md §2.4 (A1-A9). The InfluxQL aggregation surface
  * (MEAN/SUM/MIN/MAX/COUNT/FIRST/LAST/DISTINCT/PERCENTILE/MEDIAN/STDDEV/
  * SPREAD, GROUP BY time(n) — ref README.md:3) over the events table.
  *
  * Scale notes: every groupBy below is a partial+final hash aggregate
  * (map-side combine), so the shuffle carries one row per (group, partition),
  * not per input row. At 100 TB the grouping keys here (event_type, user_id,
  * 1-minute buckets) are low-cardinality → the final agg is tiny; AQE
  * coalesces the post-shuffle partitions.
  */
object QAgg {

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_group_by_plc",
      "A1: group by device/measurement key (ref create_my_data_groups, InfluxConnector2.py:244-270)",
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q_group_by_interval",
      "A2: group by acquisition interval, collect member set (ref group_by_interval, InfluxConnector2.py:85-94)",
      """SELECT CASE event_type WHEN 'click' THEN '1s' WHEN 'view' THEN '2s'
        |            WHEN 'purchase' THEN '10s' WHEN 'signup' THEN '60s' ELSE '300s' END AS interval,
        |       array_to_string(list_sort(list(DISTINCT user_id)), ',') AS members,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY interval""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("interval",
          when(col("event_type") === "click", "1s").when(col("event_type") === "view", "2s")
            .when(col("event_type") === "purchase", "10s").when(col("event_type") === "signup", "60s")
            .otherwise("300s"))
        .groupBy("interval")
        .agg(
          concat_ws(",", transform(sort_array(collect_set(col("user_id"))), _.cast("string"))).as("members"),
          count(lit(1)).as("n"))
        .orderBy("interval")
    },

    GraftQuery(
      "q_agg_basic",
      "A3: MEAN/SUM/MIN/MAX/COUNT per series (InfluxQL, README.md:3)",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |       round(avg(value), 4) AS avg_value, round(min(value), 2) AS min_value,
        |       round(max(value), 2) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"),
          round(avg("value"), 4).as("avg_value"), round(min("value"), 2).as("min_value"),
          round(max("value"), 2).as("max_value"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_agg_last",
      "A4: FIRST()/LAST() per series via min_by/max_by (the m_value cache, ref InfluxConnector2.py:53,173)",
      """SELECT user_id, arg_max(value, ts) AS last_value, arg_min(value, ts) AS first_value,
        |       strftime(max(ts)::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS last_ts_s
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("user_id")
        .agg(max_by(col("value"), col("ts")).as("last_value"),
          min_by(col("value"), col("ts")).as("first_value"),
          tsS(max(col("ts"))).as("last_ts_s"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q_agg_distinct",
      "A5: COUNT(DISTINCT) per group (InfluxQL DISTINCT; at 100 TB swap to approx_count_distinct/HLL)",
      """SELECT event_type, count(DISTINCT user_id) AS nd_users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("nd_users"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_agg_approx_distinct",
      "A5 scale path: approx_count_distinct (HLL++) — what replaces exact distinct at 100 TB. " +
        "The sketch value is engine-private, so the oracled output is the exact count plus a " +
        "relative-error CHECK: |approx - exact| <= 5% of exact with the sketch built at " +
        "rsd 0.01 (a 5-sigma band — the default 0.05 rsd exceeded 5% at sf0.1 cardinalities), " +
        "a boolean both engines hash identically",
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS within_rsd
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.05).as("within_rsd"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_agg_percentile",
      "A6: PERCENTILE/MEDIAN/STDDEV (InfluxQL, README.md:3); exact percentile matches quantile_cont",
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_value,
        |       round(quantile_cont(value, 0.9), 4) AS p90_value,
        |       round(stddev_samp(value), 4) AS sd_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(round(expr(Q.pctl(s, "value", "0.5")), 4).as("median_value"),
          round(expr(Q.pctl(s, "value", "0.9")), 4).as("p90_value"),
          round(stddev_samp(col("value")), 4).as("sd_value"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_agg_spread",
      "A7: SPREAD = max - min (InfluxQL, README.md:3)",
      """SELECT event_type, round(max(value) - min(value), 2) AS spread
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      events(s, dir).groupBy("event_type")
        .agg(round(max("value") - min("value"), 2).as("spread"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_agg_rollup",
      "A8: multi-granularity rollup (per-PLC, per-tag, total dashboards, ref README.md:98-100)",
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(user_id::VARCHAR, 'ALL') AS uid,
        |       count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ROLLUP(event_type, user_id) ORDER BY etype, uid""".stripMargin) { (s, dir) =>
      events(s, dir).rollup(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
          coalesce(col("user_id").cast("string"), lit("ALL")).as("uid"),
          col("n"), col("sum_value"))
        .orderBy("etype", "uid")
    },

    GraftQuery(
      "q_downsample_1m",
      "A9/F8 FLAGSHIP: GROUP BY time(1m), series — the InfluxQL continuous-query surface " +
        "(README.md:3). The mean runs over INTEGER cents with the floor half-up spelling " +
        "(r12): the sf1 parity sweep caught avg-of-doubles landing on round(4) ties where " +
        "the engines' partial-sum orders differ by an ulp — and a naive integer mean " +
        "round(s/n/100, 4) is WORSE, because exact dyadic ties (n = 8 buckets) hit the " +
        "engines' opposite tie rules (Spark HALF_UP on the decimal string vs DuckDB " +
        "half-to-even in float space). floor(s·100/n + 0.5)/10⁴ is the same op sequence " +
        "in both engines — exact integer sum, one division, floor — bit-equal at any " +
        "scale, tie rule half-up by construction.",
      """SELECT strftime(time_bucket(INTERVAL '1 minute', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
        |       event_type,
        |       floor(CAST(sum(round(value * 100)::BIGINT) * 100 AS DOUBLE) / count(*) + 0.5)
        |         / 10000 AS mean_value,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
      events(s, dir)
        .withColumn("v100", round(col("value") * 100, 0).cast("long"))
        .groupBy(window(col("ts"), "1 minute"), col("event_type"))
        .agg((floor((sum(col("v100")) * 100).cast("double") / count(lit(1)) + 0.5) / 10000)
          .as("mean_value"),
          count(lit(1)).as("n"))
        .select(tsS(col("window.start")).as("ws"), col("event_type"), col("mean_value"), col("n"))
        .orderBy("ws", "event_type")
    },

    GraftQuery(
      "q_anomaly_mad",
      "Extension: robust anomaly detection per series — median + MAD (median absolute " +
        "deviation), flag points with |v - med| > 3*MAD. Medians run over INTEGER cents so " +
        "both engines' even-count interpolation is exactly representable (no boundary-tie " +
        "drift); exact percentile is per-group-bounded here — the 100 TB path swaps in " +
        "approx_percentile with identical plan shape",
      """WITH e AS (SELECT event_id, event_type, value,
        |                  round(value * 100)::BIGINT AS v100 FROM events),
        |m AS (SELECT event_type, median(v100) AS med100 FROM e GROUP BY 1),
        |d AS (SELECT e.*, m.med100 FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(abs(v100 - med100)) AS mad100 FROM d GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       round(med100 / 100, 4) AS med, round(mad100 / 100, 4) AS mad
        |FROM d JOIN md USING (event_type)
        |WHERE abs(v100 - med100) > 3 * mad100
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100, 0).cast("long").as("v100"))
      val m = e.groupBy("event_type").agg(expr(Q.pctl(s, "v100", "0.5D")).as("med100"))
      val d = e.join(broadcast(m), Seq("event_type"))
      val md = d.groupBy("event_type")
        .agg(expr(Q.pctl(s, "abs(v100 - med100)", "0.5D")).as("mad100"))
      d.join(broadcast(md), Seq("event_type"))
        .filter(abs(col("v100") - col("med100")) > lit(3) * col("mad100"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(col("med100") / 100, 4).as("med"), round(col("mad100") / 100, 4).as("mad"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_anomaly_ensemble",
      "Extension (r10): consensus anomaly detection — three detectors vote per point " +
        "(W7's median/MAD band, the Tukey IQR fence, and a seasonal-adjusted variant " +
        "against the hour-of-day median) and a point alerts on consensus (≥2 votes), the " +
        "'page only when detectors agree' practice that cuts single-detector false " +
        "positives. Every statistic runs on INTEGER cents (exact percentile " +
        "interpolation: .5/.25 fractions are binary-exact, the W7 rule), so no flag can " +
        "flip between engines. Per-series aggregates broadcast back — the detectors " +
        "share ONE scan and the same grouping keys.",
      """WITH e AS (SELECT event_id, event_type, value,
        |                  round(value * 100)::BIGINT AS v100,
        |                  date_part('hour', ts) AS hr FROM events),
        |m AS (SELECT event_type, median(v100) AS med100,
        |             quantile_cont(v100, 0.25) AS q1,
        |             quantile_cont(v100, 0.75) AS q3 FROM e GROUP BY 1),
        |d AS (SELECT e.*, m.med100, m.q1, m.q3 FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(abs(v100 - med100)) AS mad100 FROM d GROUP BY 1),
        |hm AS (SELECT event_type, hr, median(v100) AS hmed100 FROM e GROUP BY 1, 2),
        |f AS (SELECT d.event_id, d.event_type, d.value,
        |             CASE WHEN abs(d.v100 - d.med100) > 3 * md.mad100 THEN 1 ELSE 0 END
        |               AS f_mad,
        |             CASE WHEN d.v100 < d.q1 - 1.5 * (d.q3 - d.q1)
        |                    OR d.v100 > d.q3 + 1.5 * (d.q3 - d.q1) THEN 1 ELSE 0 END
        |               AS f_iqr,
        |             CASE WHEN abs(d.v100 - hm.hmed100) > 3 * md.mad100 THEN 1 ELSE 0 END
        |               AS f_seasonal
        |      FROM d JOIN md USING (event_type) JOIN hm
        |        ON hm.event_type = d.event_type AND hm.hr = d.hr)
        |SELECT event_id, event_type, value,
        |       (f_mad + f_iqr + f_seasonal)::BIGINT AS votes,
        |       f_mad + f_iqr + f_seasonal >= 2 AS consensus
        |FROM f WHERE f_mad + f_iqr + f_seasonal >= 1
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100, 0).cast("long").as("v100"),
        hour(col("ts")).as("hr"))
      val m = e.groupBy("event_type").agg(
        expr(Q.pctl(s, "v100", "0.5D")).as("med100"),
        expr(Q.pctl(s, "v100", "0.25D")).as("q1"),
        expr(Q.pctl(s, "v100", "0.75D")).as("q3"))
      val d = e.join(broadcast(m), Seq("event_type"))
      val md = d.groupBy("event_type")
        .agg(expr(Q.pctl(s, "abs(v100 - med100)", "0.5D")).as("mad100"))
      val hm = e.groupBy("event_type", "hr").agg(expr(Q.pctl(s, "v100", "0.5D")).as("hmed100"))
      val fMad = when(abs(col("v100") - col("med100")) > lit(3) * col("mad100"), 1).otherwise(0)
      val iqr = col("q3") - col("q1")
      val fIqr = when(col("v100") < col("q1") - lit(1.5) * iqr ||
        col("v100") > col("q3") + lit(1.5) * iqr, 1).otherwise(0)
      val fSea = when(abs(col("v100") - col("hmed100")) > lit(3) * col("mad100"), 1).otherwise(0)
      val votes = fMad + fIqr + fSea
      d.join(broadcast(md), Seq("event_type"))
        .join(broadcast(hm), Seq("event_type", "hr"))
        .withColumn("votes", votes.cast("bigint"))
        .filter(col("votes") >= 1)
        .select(col("event_id"), col("event_type"), col("value"), col("votes"),
          (col("votes") >= 2).as("consensus"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_value_psi",
      "Extension (r10): population stability index per series type — the standard " +
        "ML-ops drift metric between the first and second half of the window: decile " +
        "bins from the BASELINE half's exact integer-cents quantiles (binary-exact " +
        "interpolation, the W7 rule), +1-smoothed bin shares, PSI = Σ (p2−p1)·ln(p2/p1). " +
        "PSI > 0.2 is the retrain-trigger convention. Bin boundaries broadcast into a " +
        "projection — two counting aggregates over one scan; `+0` folds −0.0 on " +
        "near-zero PSI (the q_pmi_bigrams ln-rounding convention).",
      """WITH e AS (SELECT event_type, round(value * 100)::BIGINT AS v100,
        |                  CASE WHEN ts < '2024-01-16' THEN 1 ELSE 2 END AS period
        |           FROM events),
        |b AS (SELECT event_type,
        |             quantile_cont(v100, 0.1) AS b1, quantile_cont(v100, 0.2) AS b2,
        |             quantile_cont(v100, 0.3) AS b3, quantile_cont(v100, 0.4) AS b4,
        |             quantile_cont(v100, 0.5) AS b5, quantile_cont(v100, 0.6) AS b6,
        |             quantile_cont(v100, 0.7) AS b7, quantile_cont(v100, 0.8) AS b8,
        |             quantile_cont(v100, 0.9) AS b9
        |      FROM e WHERE period = 1 GROUP BY event_type),
        |binned AS (SELECT e.event_type, e.period,
        |                  1 + (CASE WHEN v100 > b1 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b2 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b3 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b4 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b5 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b6 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b7 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b8 THEN 1 ELSE 0 END)
        |                    + (CASE WHEN v100 > b9 THEN 1 ELSE 0 END) AS bin
        |           FROM e JOIN b USING (event_type)),
        |grid AS (SELECT DISTINCT event_type, unnest(range(1, 11)) AS bin FROM e),
        |c AS (SELECT g.event_type, g.bin,
        |             coalesce(sum(CASE WHEN x.period = 1 THEN 1 ELSE 0 END), 0) + 1 AS c1,
        |             coalesce(sum(CASE WHEN x.period = 2 THEN 1 ELSE 0 END), 0) + 1 AS c2
        |      FROM grid g LEFT JOIN binned x
        |        ON x.event_type = g.event_type AND x.bin = g.bin
        |      GROUP BY 1, 2),
        |n AS (SELECT event_type, sum(c1) AS n1, sum(c2) AS n2 FROM c GROUP BY 1)
        |SELECT c.event_type,
        |       round(sum((c2::DOUBLE / n2 - c1::DOUBLE / n1)
        |                 * ln((c2::DOUBLE / n2) / (c1::DOUBLE / n1))), 4) + 0 AS psi,
        |       (max(n1) - 10)::BIGINT AS n_baseline, (max(n2) - 10)::BIGINT AS n_current
        |FROM c JOIN n USING (event_type)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin) { (s, dir) =>
      val e = events(s, dir).select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("v100"),
        when(col("ts") < lit("2024-01-16").cast("timestamp"), 1).otherwise(2).as("period"))
      val bAggs = (1 to 9).map(i => expr(Q.pctl(s, "v100", s"0.${i}D")).as(s"b$i"))
      val b = e.filter(col("period") === 1).groupBy("event_type")
        .agg(bAggs.head, bAggs.tail: _*)
      val binCol = (1 to 9).map(i => when(col("v100") > col(s"b$i"), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
      val binned = e.join(broadcast(b), Seq("event_type")).withColumn("bin", binCol)
      // the 10-bin grid fans out per type via explode — no join, no BNLJ
      val grid = e.select("event_type").distinct()
        .select(col("event_type"),
          explode(array((1 to 10).map(lit(_)): _*)).as("bin"))
      val c = grid.join(binned.toDF("x_et", "v100", "period", "b1", "b2", "b3", "b4",
          "b5", "b6", "b7", "b8", "b9", "x_bin"),
          col("event_type") === col("x_et") && col("bin") === col("x_bin"), "left")
        .groupBy("event_type", "bin")
        .agg((coalesce(sum(when(col("period") === 1, 1).otherwise(0)), lit(0)) + 1).as("c1"),
          (coalesce(sum(when(col("period") === 2, 1).otherwise(0)), lit(0)) + 1).as("c2"))
      val wN = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      val p1 = col("c1").cast("double") / col("n1")
      val p2 = col("c2").cast("double") / col("n2")
      c.withColumn("n1", sum(col("c1")).over(wN))
        .withColumn("n2", sum(col("c2")).over(wN))
        .groupBy("event_type")
        .agg((round(sum((p2 - p1) * log(p2 / p1)), 4) + lit(0.0)).as("psi"),
          (max(col("n1")) - 10).cast("bigint").as("n_baseline"),
          (max(col("n2")) - 10).cast("bigint").as("n_current"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_skew_salted_avg",
      "Extension: two-stage SALTED aggregation (operators/Skew) under the oracle gate — " +
        "the hot-key fix for a chatty PLC dominating one reducer: stage 1 aggregates on " +
        "(key, salt) spreading the hot key over 32 reducers, stage 2 merges partials. " +
        "Only algebraic aggregates decompose this way; the oracle is the PLAIN aggregate " +
        "(same numbers, skew-proof plan)",
      """SELECT event_type, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.Skew.saltedAvg(events(s, dir), "event_type", "value", salts = 32)
        .select(col("event_type"), round(col("avg_value"), 4).as("avg_value"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_winsorize",
      "Extension: winsorization — clamp each series to its [p5, p95] band (the robust " +
        "preprocessing step before training on sensor values; the clip twin of the MAD " +
        "detector). Exact interpolated percentiles over integer cents; the final round(4) " +
        "absorbs any cross-engine interpolation ulp before values are compared",
      """WITH e AS (SELECT event_id, event_type, value,
        |                  round(value * 100)::BIGINT AS v100 FROM events),
        |m AS (SELECT event_type,
        |             quantile_cont(v100, 0.05) AS p05,
        |             quantile_cont(v100, 0.95) AS p95
        |      FROM e GROUP BY 1)
        |SELECT event_id, e.event_type, value,
        |       round(least(greatest(v100, p05), p95) / 100, 4) AS clipped,
        |       round(p05 / 100, 4) AS lo, round(p95 / 100, 4) AS hi
        |FROM e JOIN m USING (event_type)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir).select(col("event_id"), col("event_type"), col("value"),
        round(col("value") * 100, 0).cast("long").as("v100"))
      val m = e.groupBy("event_type").agg(
        expr(Q.pctl(s, "v100", "0.05D")).as("p05"),
        expr(Q.pctl(s, "v100", "0.95D")).as("p95"))
      e.join(broadcast(m), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(least(greatest(col("v100"), col("p05")), col("p95")) / 100, 4).as("clipped"),
          round(col("p05") / 100, 4).as("lo"), round(col("p95") / 100, 4).as("hi"))
        .orderBy("event_id")
    },

    GraftQuery(
      "q_funnel",
      "Extension: sequential conversion funnel — first 'view', first 'click' AFTER it, " +
        "first 'purchase' after that, per user (the ordered-pattern analytic). Three " +
        "conditional min-aggregates + two joins, all keyed on user_id so the shuffle " +
        "partitioning is planned once and reused; no per-user sort, no window over raw rows",
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT v.user_id,
        |       strftime(v.t_view, '%Y-%m-%d %H:%M:%S') AS t_view,
        |       strftime(c.t_click, '%Y-%m-%d %H:%M:%S') AS t_click,
        |       strftime(p.t_purchase, '%Y-%m-%d %H:%M:%S') AS t_purchase,
        |       CASE WHEN p.user_id IS NOT NULL THEN 3
        |            WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      v.join(c.withColumn("__hasC", lit(1)), Seq("user_id"), "left")
        .join(p.withColumn("__hasP", lit(1)), Seq("user_id"), "left")
        .select(col("user_id"),
          tsS(col("t_view")).as("t_view"),
          tsS(col("t_click")).as("t_click"),
          tsS(col("t_purchase")).as("t_purchase"),
          when(col("__hasP").isNotNull, 3)
            .when(col("__hasC").isNotNull, 2).otherwise(1).cast("int").as("stage"))
        .orderBy("user_id")
    },

    GraftQuery(
      "q_ohlc",
      "A12 (r9): OHLC candlestick downsample — open/high/low/close/count per series per hour " +
        "(the financial-chart shape of InfluxQL FIRST/MAX/MIN/LAST + GROUP BY time(1h), " +
        "ref README.md:3 Grafana panels). Open/close pick the bucket's earliest/latest point " +
        "deterministically via asc/desc row_number over the SAME (user_id, hour) hash " +
        "partitioning — Catalyst reuses one Exchange for both sorts and the final agg, so the " +
        "whole query is a single shuffle; high/low/count ride the same hash aggregate.",
      """WITH b AS (
        |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS t, value,
        |         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP)
        |                            ORDER BY ts, event_id) AS rn_a,
        |         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 hour', ts::TIMESTAMP)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT user_id, strftime(t, '%Y-%m-%d %H:%M:%S') AS hour_s,
        |       max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |       max(value) AS high, min(value) AS low,
        |       max(CASE WHEN rn_d = 1 THEN value END) AS close, count(*) AS n
        |FROM b GROUP BY user_id, t ORDER BY user_id, hour_s""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir).withColumn("t", date_trunc("hour", col("ts")))
      val wa = Window.partitionBy("user_id", "t").orderBy(col("ts").asc, col("event_id").asc)
      val wd = Window.partitionBy("user_id", "t").orderBy(col("ts").desc, col("event_id").desc)
      e.withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy("user_id", "t")
        .agg(
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .select(col("user_id"), tsS(col("t")).as("hour_s"),
          col("open"), col("high"), col("low"), col("close"), col("n"))
        .orderBy("user_id", "hour_s")
    },

    GraftQuery(
      "q_retention_cohort",
      "A13 (r9): retention-cohort matrix — users bucketed by first-seen day, per-cohort " +
        "fraction still active N days later (the device-fleet health twin: 'of the PLCs " +
        "first seen Monday, how many still report on day N'). Three aggregates all keyed " +
        "on user_id or the tiny cohort key: first-seen via groupBy(user_id), the activity " +
        "matrix dedups (user, day) pairs map-side before the count, and cohort sizes join " +
        "back broadcast (one row per cohort day — k rows at any scale). The only wide " +
        "shuffle at 100 TB is the user_id hash join of events against first-seen, the " +
        "partitioning a production events table would already be bucketed by.",
      """WITH fw AS (
        |  SELECT user_id, min(ts::DATE) AS cohort_d FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT e.user_id, fw.cohort_d,
        |         datediff('day', fw.cohort_d, e.ts::DATE) AS days_since
        |  FROM events e JOIN fw USING (user_id)),
        |c AS (SELECT cohort_d, count(*) AS cohort_size FROM fw GROUP BY cohort_d)
        |SELECT strftime(a.cohort_d, '%Y-%m-%d') AS cohort_day, a.days_since,
        |       count(*) AS active_users, c.cohort_size,
        |       round(count(*)::DOUBLE / c.cohort_size, 4) AS retention
        |FROM a JOIN c USING (cohort_d)
        |GROUP BY a.cohort_d, a.days_since, c.cohort_size
        |ORDER BY cohort_day, days_since""".stripMargin) { (s, dir) =>
      val e = events(s, dir)
      val fw = e.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_d"))
      val act = e.select(col("user_id"), to_date(col("ts")).as("d"))
        .join(fw, Seq("user_id"))
        .select(col("user_id"), col("cohort_d"),
          datediff(col("d"), col("cohort_d")).as("days_since"))
        .distinct()
      val sizes = fw.groupBy("cohort_d").agg(count(lit(1)).as("cohort_size"))
      act.groupBy("cohort_d", "days_since").agg(count(lit(1)).as("active_users"))
        .join(broadcast(sizes), Seq("cohort_d"))
        .select(date_format(col("cohort_d"), "yyyy-MM-dd").as("cohort_day"),
          col("days_since").cast("bigint").as("days_since"),
          col("active_users"), col("cohort_size"),
          round(col("active_users").cast("double") / col("cohort_size"), 4).as("retention"))
        .orderBy("cohort_day", "days_since")
    },

    GraftQuery(
      "q_seasonal_profile",
      "A14 (r9): hour-of-day seasonal profile per series type — the daily-cycle baseline " +
        "(per-hour mean) and each hour's deviation from the series' overall mean, the " +
        "seasonal-naive reference that W6's z-score and W13's CUSUM compare against. Both " +
        "levels come from ONE partial aggregate: per-(type, hour) count+sum rows (k×24, tiny " +
        "at any scale) re-aggregate to per-type totals and join back broadcast — the raw " +
        "events are scanned exactly once. Means run on INTEGER cents with the floor " +
        "half-up spelling (the q_downsample_1m r12 sf1-parity convention; this round's " +
        "sf0.001 sweep caught the avg-of-doubles form losing a round(4) ulp tie at row " +
        "77), and the deviation is the exact difference of the two quantized means. " +
        "`+0` folds IEEE -0.0 on the near-zero deviations.",
      """WITH h AS (
        |  SELECT event_type, extract(hour FROM ts)::BIGINT AS hr,
        |         count(*) AS n, sum(round(value * 100)::BIGINT) AS sv100
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(n)::BIGINT AS tn, sum(sv100) AS tsv100 FROM h GROUP BY 1)
        |SELECT h.event_type, h.hr, h.n,
        |       floor(CAST(h.sv100 * 100 AS DOUBLE) / h.n + 0.5) / 10000 AS avg_v,
        |       floor(CAST(h.sv100 * 100 AS DOUBLE) / h.n + 0.5) / 10000
        |         - floor(CAST(t.tsv100 * 100 AS DOUBLE) / t.tn + 0.5) / 10000 + 0
        |         AS seasonal_dev
        |FROM h JOIN t USING (event_type) ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
      val h = events(s, dir)
        .withColumn("v100", round(col("value") * 100, 0).cast("long"))
        .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v100")).as("sv100"))
      val t = h.groupBy("event_type")
        .agg(sum(col("n")).as("tn"), sum(col("sv100")).as("tsv100"))
      val hourMean = floor((col("sv100") * 100).cast("double") / col("n") + 0.5) / 10000
      val allMean  = floor((col("tsv100") * 100).cast("double") / col("tn") + 0.5) / 10000
      h.join(broadcast(t), Seq("event_type"))
        .select(col("event_type"), col("hr"), col("n"),
          hourMean.as("avg_v"),
          (hourMean - allMean + lit(0.0)).as("seasonal_dev"))
        .orderBy("event_type", "hr")
    },

    GraftQuery(
      "q_top_movers",
      "Extension (r10): period-over-period TOP MOVERS — per series, the mean value " +
        "before vs after a boundary and the percent change, ranked by the change " +
        "(the 'what shifted this week' panel next to the drift detectors: PSI/CUSUM " +
        "say THAT a distribution moved, this says WHICH series and BY HOW MUCH). " +
        "One conditional aggregation over one scan — both halves share the " +
        "shuffle; the rank runs on the k-series aggregate frame. The rank orders " +
        "by the ROUNDED change (ties to the series key), so no cross-engine ulp " +
        "can reorder it.",
      """WITH h AS (SELECT event_type,
        |                  avg(CASE WHEN ts < TIMESTAMP '2024-01-15'
        |                           THEN value END) AS a,
        |                  avg(CASE WHEN ts >= TIMESTAMP '2024-01-15'
        |                           THEN value END) AS b
        |           FROM events GROUP BY event_type),
        |p AS (SELECT event_type, round(a, 4) AS avg_before, round(b, 4) AS avg_after,
        |             round((b - a) / a * 100, 4) + 0 AS pct_change
        |      FROM h)
        |SELECT CAST(row_number() OVER (ORDER BY pct_change DESC, event_type)
        |            AS INT) AS mover_rank,
        |       event_type, avg_before, avg_after, pct_change
        |FROM p ORDER BY mover_rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cut = lit("2024-01-15").cast("timestamp")
      val h = events(s, dir).groupBy("event_type").agg(
        avg(when(col("ts") < cut, col("value"))).as("a"),
        avg(when(col("ts") >= cut, col("value"))).as("b"))
      val p = h.select(col("event_type"),
        round(col("a"), 4).as("avg_before"),
        round(col("b"), 4).as("avg_after"),
        (round((col("b") - col("a")) / col("a") * 100, 4) + lit(0.0)).as("pct_change"))
      // the rank window runs on the k-series aggregate frame (k = distinct
      // event types), bounded by construction like the Markov totals
      val wr = Window.orderBy(col("pct_change").desc, col("event_type"))
      p.withColumn("mover_rank", row_number().over(wr))
        .select(col("mover_rank"), col("event_type"),
          col("avg_before"), col("avg_after"), col("pct_change"))
        .orderBy("mover_rank")
    },

    GraftQuery(
      "q_rfm_segments",
      "A15 (r9): RFM customer segmentation over the orders star — recency/frequency/monetary " +
        "quintile scores + named segments, the classic marketing-analytics rollup. One " +
        "groupBy(custkey) aggregate; the anchor date is a driver-side scalar (a scalar " +
        "subquery would plan the BNLJ PlanAuditSpec bans); money routes through " +
        "DECIMAL(18,2) so the sum is order-independent; every ntile is tie-broken by " +
        "custkey so quintile edges are deterministic in both engines. The three quintile " +
        "scores run through Q.distributedNtile (r10): range-partitioned exact global rank " +
        "+ broadcast count offsets + the SQL ntile bucket formula — bit-equal to the " +
        "global window (RfmNtileSpec pins both branches) but with no single-reducer sort, " +
        "so a 10⁹-row customer dimension stays parallel. `graft.rfm.globalNtile=true` " +
        "opts back into the legacy one-window-per-score spelling.",
      """WITH m AS (
        |  SELECT o_custkey, max(o_orderdate::DATE) AS last_o, count(*) AS freq,
        |         round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS money
        |  FROM orders GROUP BY 1),
        |x AS (SELECT max(o_orderdate::DATE) AS mx FROM orders),
        |r AS (
        |  SELECT o_custkey, datediff('day', last_o, (SELECT mx FROM x)) AS recency_d,
        |         freq, money
        |  FROM m),
        |sc AS (
        |  SELECT o_custkey, recency_d, freq, money,
        |         ntile(5) OVER (ORDER BY recency_d DESC, o_custkey) AS r_score,
        |         ntile(5) OVER (ORDER BY freq ASC, o_custkey) AS f_score,
        |         ntile(5) OVER (ORDER BY money ASC, o_custkey) AS m_score
        |  FROM r)
        |SELECT o_custkey, recency_d, freq, money, r_score, f_score, m_score,
        |       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
        |            WHEN r_score >= 4 AND f_score <= 2 THEN 'recent_light'
        |            ELSE 'regular' END AS segment
        |FROM sc ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = orders(s, dir)
      // r13 (VERDICT r12 #1): the three quintiles ride ONE stacked ntile
      // pass (one range exchange + one checkpoint + one collect) instead of
      // three chained distributedNtile calls (3 × sample/checkpoint/collect,
      // ~25 jobs). The customer aggregate is checkpointed FIRST so the
      // anchor-date scalar, the range sampler and the range shuffle all read
      // k checkpointed rows instead of re-running the orders aggregate
      // (the r12 counter-measurement that rejected this checkpoint predates
      // the stacked pass — with one consumer chain it lost; with three
      // readers it wins, re-measured r13).
      val m0 = Q.materialize(o.groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_o"),
          count(lit(1)).as("freq"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).as("money")))
      // anchor = max(last_o) over customers == max(o_orderdate) over orders
      val mxStr = m0.agg(max(col("last_o"))).head().getDate(0).toString
      val m = m0
        .withColumn("recency_d", datediff(lit(mxStr).cast("date"), col("last_o")))
        .select("o_custkey", "recency_d", "freq", "money")
      val sc =
        if (s.conf.getOption("graft.rfm.globalNtile").exists(_.toBoolean))
          m.withColumn("r_score",
              ntile(5).over(Window.orderBy(col("recency_d").desc, col("o_custkey"))))
            .withColumn("f_score",
              ntile(5).over(Window.orderBy(col("freq").asc, col("o_custkey"))))
            .withColumn("m_score",
              ntile(5).over(Window.orderBy(col("money").asc, col("o_custkey"))))
        else {
          // ascending stacked orderings; DESC recency = ASC −recency_d.
          // Exact double casts: recency_d is a day diff (≤ ~10⁵) and freq a
          // per-customer order count (< 2⁵³ at any real scale); money is
          // already double.
          Q.stackedNtile(m, 5,
            Seq((-col("recency_d")).cast("double"),
              col("freq").cast("double"),
              col("money")),
            Seq(col("o_custkey")), "__score")
            .groupBy("o_custkey")
            .agg(first(col("recency_d")).as("recency_d"),
              first(col("freq")).as("freq"),
              first(col("money")).as("money"),
              max(when(col("__sid") === 1, col("__score"))).as("r_score"),
              max(when(col("__sid") === 2, col("__score"))).as("f_score"),
              max(when(col("__sid") === 3, col("__score"))).as("m_score"))
        }
      sc.select(col("o_custkey"),
          col("recency_d").cast("bigint").as("recency_d"), col("freq"), col("money"),
          col("r_score").cast("int").as("r_score"), col("f_score").cast("int").as("f_score"),
          col("m_score").cast("int").as("m_score"),
          when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
            .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk_loyal")
            .when(col("r_score") >= 4 && col("f_score") <= 2, "recent_light")
            .otherwise("regular").as("segment"))
        .orderBy("o_custkey")
    },

    hllSketch("q_hll_sketch", 64, "0.709",
      "A18 (r11): HyperLogLog distinct-user sketch per event type, REPLAYED " +
        "bit-for-bit by the oracle — the 100 TB distinct-counting operator " +
        "(a sketch shuffles m registers per group where count(DISTINCT) " +
        "shuffles every key) built from engine-portable arithmetic: LCG hash " +
        "mod 1e9+7, register = h % m, rank = trailing-zero ladder (a " +
        "generated integer CASE both engines fold identically), one " +
        "max-per-register aggregate, then the standard estimator " +
        "(alpha_64 = 0.709, linear-counting branch below 2.5m) next to the " +
        "exact count and the relative error — the estimator-honesty shape of " +
        "q_knn_recall/q_minhash_calibration for cardinality. The hash is a " +
        "31-bit xor-shift avalanche (two multiply-mod-2^31 + xor-of-" +
        "high-bits rounds — a single LCG left registers too regular: 0 " +
        "empties at n = 2.3m where Poisson expects 6, blocking linear " +
        "counting); measured 5.6% error at n=150 (LC branch) and 2.6% at " +
        "n=1500 (raw branch). The register sum is m dyadic doubles (exact " +
        "in any order); only ln() crosses libms, absorbed by round(4)."),

    hllSketch("q_hll_sketch_w256", 256, "0.7183",
      "A21 (r12, VERDICT r11 #8): the WIDTH-parameterized HLL — same " +
        "avalanche hash and rank ladder at m = 256 registers (standard " +
        "error 1.04/sqrt(m) ≈ 6.5% vs 13% at m = 64; alpha_256 = " +
        "0.7213/(1 + 1.079/256) rounded to 0.7183, an identical literal in " +
        "both engines). The m = 64 key stays the compact demo; deployments " +
        "size m from the error budget (1024+ for sub-3.3% at 100 TB — " +
        "still just 1 KB of mergeable state per group) and " +
        "HllWidthGateSpec pins the measured error against each width's " +
        "theoretical band."),

    GraftQuery(
      "q_hll_union",
      "A22 (r12): HLL MERGEABILITY — the property that makes sketches the 100 TB " +
        "distinct story: per-DAY register tables (the per-partition artifact a fleet " +
        "of executors or a day-partitioned store ships) merge by max-per-register " +
        "into EXACTLY the registers a single global pass produces (max is " +
        "associative and commutative), so the union cardinality of any day range " +
        "needs m longs per day, never a re-scan — while the naive sum of daily " +
        "distinct counts overcounts every returning user. Output pins all three: " +
        "merged_est == direct_est bit-for-bit (the mergeability proof, hash-checked " +
        "by the oracle replaying both paths), against n_exact and the inflated " +
        "sum_daily_exact. Same m=64 avalanche-hash registers as q_hll_sketch.",
      s"""WITH x1 AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |              (user_id * 2654435761) % 2147483648 AS x1 FROM events),
         |x2 AS (SELECT event_type, day, xor(x1, x1 // 32768) AS x2 FROM x1),
         |x3 AS (SELECT event_type, day, (x2 * 2246822519) % 2147483648 AS x3 FROM x2),
         |b AS (SELECT event_type, day,
         |             xor(x3, x3 // 8192) % 64 AS reg,
         |             xor(x3, x3 // 8192) // 64 AS h2
         |      FROM x3),
         |rk AS (SELECT event_type, day, reg, max($rankLadder) AS m
         |       FROM b GROUP BY event_type, day, reg),
         |mg AS (SELECT event_type, reg, max(m) AS m FROM rk GROUP BY event_type, reg),
         |dr AS (SELECT event_type, reg, max($rankLadder) AS m
         |       FROM b GROUP BY event_type, reg),
         |ma AS (SELECT event_type, count(*) AS present,
         |              sum(1.0 / (1::BIGINT << m)) AS sp FROM mg GROUP BY event_type),
         |me AS (SELECT event_type,
         |              CASE WHEN 0.709 * 4096.0 / (sp + (64 - present)) <= 160.0
         |                        AND 64 - present > 0
         |                   THEN 64.0 * ln(64.0 / (64 - present))
         |                   ELSE 0.709 * 4096.0 / (sp + (64 - present)) END AS est
         |       FROM ma),
         |da AS (SELECT event_type, count(*) AS present,
         |              sum(1.0 / (1::BIGINT << m)) AS sp FROM dr GROUP BY event_type),
         |de AS (SELECT event_type,
         |              CASE WHEN 0.709 * 4096.0 / (sp + (64 - present)) <= 160.0
         |                        AND 64 - present > 0
         |                   THEN 64.0 * ln(64.0 / (64 - present))
         |                   ELSE 0.709 * 4096.0 / (sp + (64 - present)) END AS est
         |       FROM da),
         |dx AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |              count(DISTINCT user_id) AS dn
         |       FROM events GROUP BY event_type, day),
         |sd AS (SELECT event_type, count(*) AS n_days, sum(dn) AS sum_daily_exact
         |       FROM dx GROUP BY event_type),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |      FROM events GROUP BY event_type)
         |SELECT x.event_type, sd.n_days::BIGINT AS n_days, x.n_exact,
         |       sd.sum_daily_exact::BIGINT AS sum_daily_exact,
         |       round(me.est, 4) AS merged_est, round(de.est, 4) AS direct_est
         |FROM x JOIN sd USING (event_type) JOIN me USING (event_type)
         |     JOIN de USING (event_type)
         |ORDER BY event_type""".stripMargin) { (s, dir) =>
      val b = events(s, dir)
        .withColumn("day", to_date(col("ts")))
        .withColumn("x1", expr("(user_id * 2654435761L) % 2147483648L"))
        .withColumn("x2", expr("x1 ^ (x1 div 32768)"))
        .withColumn("x3", expr("(x2 * 2246822519L) % 2147483648L"))
        .withColumn("g", expr("x3 ^ (x3 div 8192)"))
        .select(col("event_type"), col("day"),
          expr("g % 64").as("reg"), expr("g div 64").as("h2"))
        .withColumn("rank", expr(rankLadder))
      // the per-day artifact, then the max-merge — vs the direct pass
      val daily = b.groupBy("event_type", "day", "reg").agg(max(col("rank")).as("m"))
      val merged = daily.groupBy("event_type", "reg").agg(max(col("m")).as("m"))
      val direct = b.groupBy("event_type", "reg").agg(max(col("rank")).as("m"))
      def estOf(regs: org.apache.spark.sql.DataFrame, out: String) = regs
        .groupBy("event_type")
        .agg(count(lit(1)).as("present"),
          sum(expr("1.0D / CAST(shiftleft(1L, m) AS DOUBLE)")).as("sp"))
        .select(col("event_type"),
          (col("sp") + (lit(64) - col("present"))).as("s"),
          (lit(64) - col("present")).as("zeros"))
        .select(col("event_type"),
          when(lit(0.709) * 4096.0 / col("s") <= 160.0 && col("zeros") > 0,
            lit(64.0) * log(lit(64.0) / col("zeros")))
            .otherwise(lit(0.709) * 4096.0 / col("s")).as(out))
      val sd = events(s, dir).withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day").agg(countDistinct(col("user_id")).as("dn"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("dn")).as("sum_daily_exact"))
      events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(sd, "event_type")
        .join(estOf(merged, "me"), "event_type")
        .join(estOf(direct, "de"), "event_type")
        .select(col("event_type"), col("n_days"), col("n_exact"),
          col("sum_daily_exact"),
          round(col("me"), 4).as("merged_est"), round(col("de"), 4).as("direct_est"))
        .orderBy("event_type")
    },

    GraftQuery(
      "q_heavy_hitters_cms",
      "A19 (r11): Count-Min-sketch heavy hitters — the mergeable counting sketch " +
        "next to A18's cardinality sketch: a 4x512 integer counter grid (four " +
        "independent mod-1e9+7 hash rows), per-key estimate = min over the four " +
        "cells, reported for the exact top-10 series keys with the exact count " +
        "and the sketch's overestimate (CMS error is one-sided — est >= exact " +
        "ALWAYS, a structural invariant the oracle hash-pins). At 100 TB the " +
        "sketch is 2048 longs per partition merged associatively where an exact " +
        "per-key count shuffles every key; every step here is integer, so both " +
        "engines replay it bit-for-bit — no rounding convention needed at all.",
      {
        val hs = CmsA.indices.map(i =>
          s"((${CmsA(i)} * user_id + ${CmsB(i)}) % 1000000007) % 512")
        s"""WITH cells AS (${hs.zipWithIndex.map { case (h, i) =>
             s"SELECT $i AS r, $h AS c FROM events" }.mkString(" UNION ALL ")},
           |),
           |sk AS (SELECT r, c, count(*) AS n FROM cells GROUP BY r, c),
           |ex AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
           |       ORDER BY exact_n DESC, user_id LIMIT 10),
           |cand AS (${hs.zipWithIndex.map { case (h, i) =>
             s"SELECT user_id, exact_n, $i AS r, $h AS c FROM ex" }.mkString(" UNION ALL ")}
           |),
           |est AS (SELECT cand.user_id, cand.exact_n, min(sk.n) AS cms_est
           |        FROM cand JOIN sk USING (r, c) GROUP BY 1, 2)
           |SELECT user_id, exact_n, cms_est, cms_est - exact_n AS overestimate
           |FROM est ORDER BY exact_n DESC, user_id""".stripMargin
      }) { (s, dir) =>
      val ev = events(s, dir)
      def cellCol(i: Int) =
        expr(s"((${CmsA(i)}L * user_id + ${CmsB(i)}L) % 1000000007L) % 512")
      val cells = ev.select(posexplode(array(CmsA.indices.map(cellCol): _*)).as(Seq("r", "c")))
      val sk = cells.groupBy("r", "c").agg(count(lit(1)).as("n"))
      val ex = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      val cand = ex.select(col("user_id"), col("exact_n"),
        posexplode(array(CmsA.indices.map(cellCol): _*)).as(Seq("r", "c")))
      // the sketch is <= 2048 rows by construction — broadcast the probe join
      cand.join(broadcast(sk), Seq("r", "c"))
        .groupBy("user_id", "exact_n").agg(min(col("n")).as("cms_est"))
        .select(col("user_id"), col("exact_n"), col("cms_est"),
          (col("cms_est") - col("exact_n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("user_id"))
    },

    GraftQuery(
      "q_cms_union",
      "A23 (r12): Count-Min MERGEABILITY — the additive twin of q_hll_union: per-DAY " +
        "4x512 counter grids (the artifact a day-partitioned store ships) SUM into the " +
        "grid of any day range, so a range's heavy-hitter estimates need 2048 longs per " +
        "day, never a re-scan. Demonstrated as a real range query: the first half-month's " +
        "estimates from summed daily grids, pinned bit-equal to the direct single-pass " +
        "grid over the same range (count over a partition union IS the sum — " +
        "associativity made executable) next to the range's exact counts. All-integer " +
        "like A19: no rounding convention anywhere.",
      {
        val hs = CmsA.indices.map(i =>
          s"((${CmsA(i)} * user_id + ${CmsB(i)}) % 1000000007) % 512")
        s"""WITH e1 AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
           |            WHERE ts < '2024-01-16'),
           |cells AS (${hs.zipWithIndex.map { case (h, i) =>
             s"SELECT day, user_id, $i AS r, $h AS c FROM e1" }.mkString(" UNION ALL ")}
           |),
           |dsk AS (SELECT day, r, c, count(*) AS n FROM cells GROUP BY day, r, c),
           |msk AS (SELECT r, c, sum(n) AS n FROM dsk GROUP BY r, c),
           |drk AS (SELECT r, c, count(*) AS n FROM cells GROUP BY r, c),
           |ex AS (SELECT user_id, count(*) AS exact_n FROM e1 GROUP BY user_id
           |       ORDER BY exact_n DESC, user_id LIMIT 10),
           |cand AS (${hs.zipWithIndex.map { case (h, i) =>
             s"SELECT user_id, exact_n, $i AS r, $h AS c FROM ex" }.mkString(" UNION ALL ")}
           |),
           |est AS (SELECT cand.user_id, cand.exact_n,
           |               min(msk.n)::BIGINT AS cms_merged,
           |               min(drk.n)::BIGINT AS cms_direct
           |        FROM cand JOIN msk USING (r, c) JOIN drk USING (r, c)
           |        GROUP BY 1, 2)
           |SELECT user_id, exact_n, cms_merged, cms_direct,
           |       cms_merged - exact_n AS overestimate
           |FROM est ORDER BY exact_n DESC, user_id""".stripMargin
      }) { (s, dir) =>
      val e1 = events(s, dir).filter(col("ts") < lit("2024-01-16").cast("timestamp"))
        .select(col("user_id"), to_date(col("ts")).as("day"))
      def cellCol(i: Int) =
        expr(s"((${CmsA(i)}L * user_id + ${CmsB(i)}L) % 1000000007L) % 512")
      val cells = e1.select(col("day"),
        posexplode(array(CmsA.indices.map(cellCol): _*)).as(Seq("r", "c")))
      // the per-day artifact, the additive merge, and the direct pass
      val dsk = cells.groupBy("day", "r", "c").agg(count(lit(1)).as("n"))
      val msk = dsk.groupBy("r", "c").agg(sum(col("n")).as("mn"))
      val drk = cells.groupBy("r", "c").agg(count(lit(1)).as("dn"))
      val ex = e1.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
      val cand = ex.select(col("user_id"), col("exact_n"),
        posexplode(array(CmsA.indices.map(cellCol): _*)).as(Seq("r", "c")))
      cand.join(broadcast(msk), Seq("r", "c")).join(broadcast(drk), Seq("r", "c"))
        .groupBy("user_id", "exact_n")
        .agg(min(col("mn")).cast("bigint").as("cms_merged"),
          min(col("dn")).cast("bigint").as("cms_direct"))
        .select(col("user_id"), col("exact_n"), col("cms_merged"), col("cms_direct"),
          (col("cms_merged") - col("exact_n")).as("overestimate"))
        .orderBy(col("exact_n").desc, col("user_id"))
    },

    GraftQuery(
      "q_cms_width_sweep",
      "A20 (r11): Count-Min WIDTH tuning curve — the sketch-sizing twin of " +
        "q_knn_probe_sweep/q_dedup_threshold_sweep: for width w in {64, 256, " +
        "1024}, the total and worst overestimate across the exact top-10 keys " +
        "(memory 4·w counters vs error ~ N/w — the curve a deployment reads to " +
        "size the sketch before the stream starts). ALL-integer like A19: both " +
        "engines replay every counter exactly, no rounding convention at all.",
      {
        val widths = Seq(64, 256, 1024)
        val perW = widths.map { wd =>
          val hs = CmsA.indices.map(i =>
            s"((${CmsA(i)} * user_id + ${CmsB(i)}) % 1000000007) % $wd")
          s"""sk$wd AS (SELECT r, c, count(*) AS n FROM (${hs.zipWithIndex.map {
               case (h, i) => s"SELECT $i AS r, $h AS c FROM events" }.mkString(" UNION ALL ")}
             |        ) GROUP BY r, c),
             |cand$wd AS (${hs.zipWithIndex.map { case (h, i) =>
               s"SELECT user_id, exact_n, $i AS r, $h AS c FROM ex" }.mkString(" UNION ALL ")}
             |),
             |est$wd AS (SELECT $wd AS width, cand$wd.user_id,
             |                  min(sk$wd.n) - max(cand$wd.exact_n) AS over_n
             |           FROM cand$wd JOIN sk$wd USING (r, c) GROUP BY 1, 2)""".stripMargin
        }
        s"""WITH ex AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id
           |            ORDER BY exact_n DESC, user_id LIMIT 10),
           |${perW.mkString(",\n")}
           |SELECT CAST(width AS INT) AS width, sum(over_n)::BIGINT AS total_over,
           |       max(over_n)::BIGINT AS max_over
           |FROM (${widths.map(wd => s"SELECT * FROM est$wd").mkString(" UNION ALL ")})
           |GROUP BY width ORDER BY width""".stripMargin
      }) { (s, dir) =>
      val ev = events(s, dir)
      val ex = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
        .transform(Q.materialize) // 10 rows, probed once per width
      // ONE corpus pass for all three widths (r12): the cell is just
      // h % width of a width-independent row hash, so the widths ride a
      // 3-way explode map-side instead of three full events scans + three
      // sketch aggregates — same integers, one exchange on (width, r, c).
      val widths = Seq(64, 256, 1024)
      val wArr = explode(array(widths.map(w => lit(w)): _*)).as("width")
      def hashCol(i: Int) = expr(s"(${CmsA(i)}L * user_id + ${CmsB(i)}L) % 1000000007L")
      val hashes = posexplode(array(CmsA.indices.map(hashCol): _*)).as(Seq("r", "h"))
      val sk = ev.select(hashes)
        .select(col("r"), col("h"), wArr)
        .groupBy(col("width"), col("r"), (col("h") % col("width")).as("c"))
        .agg(count(lit(1)).as("n"))
      val cand = ex.select(col("user_id"), col("exact_n"), hashes)
        .select(col("user_id"), col("exact_n"), col("r"), col("h"), wArr)
        .withColumn("c", col("h") % col("width"))
      cand.join(broadcast(sk), Seq("width", "r", "c"))
        .groupBy("width", "user_id", "exact_n")
        .agg((min(col("n")) - first(col("exact_n"))).as("over_n"))
        .groupBy("width")
        .agg(sum(col("over_n")).as("total_over"), max(col("over_n")).as("max_over"))
        .select(col("width").cast("int").as("width"),
          col("total_over").cast("bigint").as("total_over"),
          col("max_over").cast("bigint").as("max_over"))
        .orderBy("width")
    },

    GraftQuery(
      "q_hist_quantiles",
      "A24 (r13): mergeable equi-width HISTOGRAM quantiles — the rank/quantile member " +
        "of the sketch family (HLL counts distinct, CMS counts frequency, this ranks): " +
        "l_extendedprice in integer cents binned into a FIXED 4096-bin grid (width " +
        "2600 cents covering [0, 106,496.00]) — 4096 mergeable longs per store " +
        "partition (counts add, like the CMS grid), where an exact percentile sorts " +
        "the corpus. Quantile inversion for p in {250,500,750,900,990}permille: " +
        "target rank r = ceil(n*p/1000) (all-integer), estimate = the first bin whose " +
        "cumulative count reaches r. The oracle pins the sketch's GUARANTEE exactly: " +
        "the exact CDF straddles the chosen bin (rank_lo < r <= rank_hi, bracketed=1 " +
        "on every row) — error bounded by one bin width by construction, no float " +
        "convention anywhere. At 100 TB: one partial+final 4096-group aggregate, the " +
        "inversion runs on the bounded bin frame, and per-day/per-partition grids " +
        "sum into any range's quantiles without a re-scan (q_cms_union's additive " +
        "merge, verbatim).",
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |           FROM lineitem),
        |h AS (SELECT cents // 2600 AS bin, count(*) AS cnt FROM c GROUP BY bin),
        |cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
        |n AS (SELECT sum(cnt)::BIGINT AS n FROM h),
        |p AS (SELECT p FROM (VALUES (250),(500),(750),(900),(990)) AS t(p)),
        |r AS (SELECT p.p, (n.n * p.p + 999) // 1000 AS r, n.n AS n FROM p, n),
        |est AS (SELECT r.p, r.n, r.r, min(cum.bin) AS bin
        |        FROM r JOIN cum ON cum.cum >= r.r GROUP BY 1, 2, 3),
        |b AS (SELECT p, n, r, bin * 2600 AS lo, bin * 2600 + 2600 AS hi FROM est),
        |x AS (SELECT b.p, b.n, b.r, b.lo, b.hi,
        |             sum(CASE WHEN c.cents < b.lo THEN 1 ELSE 0 END)::BIGINT AS rank_lo,
        |             sum(CASE WHEN c.cents < b.hi THEN 1 ELSE 0 END)::BIGINT AS rank_hi
        |      FROM b, c GROUP BY 1, 2, 3, 4, 5)
        |SELECT CAST(p AS INT) AS p_permille, n, r AS target_rank,
        |       lo AS est_lo_cents, hi AS est_hi_cents, rank_lo, rank_hi,
        |       CAST(CASE WHEN rank_lo < r AND r <= rank_hi THEN 1 ELSE 0 END AS INT)
        |         AS bracketed
        |FROM x ORDER BY p_permille""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val c = lineitem(s, dir)
        .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      val h = c.groupBy(expr("cents div 2600").as("bin")).agg(count(lit(1)).as("cnt"))
        .transform(Q.materialize) // ≤4096 rows feed cum AND n — one corpus pass
      // the inversion runs on the ≤4096-row bin frame (the Lorenz-curve
      // precedent): a global-window cumsum over the SKETCH, never the data
      val cum = h.select(col("bin"), sum(col("cnt")).over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"))
      // n from the bin frame — no second corpus scan
      val n = h.agg(sum(col("cnt")).as("n"))
      val p = s.range(0, 5).select(
        expr("element_at(array(250, 500, 750, 900, 990), CAST(id + 1 AS INT))").as("p"))
      val r = p.crossJoin(broadcast(n))
        .select(col("p"), expr("(n * p + 999) div 1000").as("r"), col("n"))
      val est = r.join(broadcast(cum), cum("cum") >= r("r"))
        .groupBy("p", "n", "r").agg(min(col("bin")).as("bin"))
      val b = est.select(col("p"), col("n"), col("r"),
        (col("bin") * 2600).as("lo"), (col("bin") * 2600 + 2600).as("hi"))
      c.crossJoin(broadcast(b))
        .groupBy("p", "n", "r", "lo", "hi")
        .agg(sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("rank_lo"),
          sum(when(col("cents") < col("hi"), 1L).otherwise(0L)).as("rank_hi"))
        .select(col("p").cast("int").as("p_permille"), col("n"),
          col("r").as("target_rank"),
          col("lo").as("est_lo_cents"), col("hi").as("est_hi_cents"),
          col("rank_lo"), col("rank_hi"),
          when(col("rank_lo") < col("r") && col("r") <= col("rank_hi"), 1)
            .otherwise(0).cast("int").as("bracketed"))
        .orderBy("p_permille")
    },

    GraftQuery(
      "q_ams_f2",
      "A25 (r13): AMS second-moment (F2) sketch — the JOIN-SIZE estimator: F2 of the " +
        "events user_id distribution IS the self-equi-join row count, the number an " +
        "optimizer wants before committing a shuffle plan. 96 independent ±1-sign " +
        "estimators (estimator constants GENERATED from the index j — one lateral " +
        "range join, not 96 scan arms; the q_hll_sketch avalanche per estimator, " +
        "sign = avalanched low bit), each a plain SUM — 96 longs per partition, " +
        "merged associatively — squared, then the classic MEDIAN-OF-MEANS: mean of " +
        "each 32-estimator group (an exact integer floor-division), median of the 3 " +
        "group values via the sum−max−min identity (exact, no float median " +
        "convention; a bare median of SQUARES is biased ~0.45·F2 low — the χ²₁ " +
        "median — which round-13 measured before landing on this shape). Everything " +
        "through the estimate is INTEGER, bit-replayed by the oracle; only rel_err " +
        "rounds. Measured 8.3%/7.5% error at sf0.1/sf0.01 vs the √(2/32)≈25% " +
        "per-group deviation. At 100 TB the sketch state is 96 longs where exact F2 " +
        "needs a full per-key count (the exact side here is the honesty check).",
      """WITH tj AS (SELECT j, (1103515245 + j * 2654435761) % 2147483648 AS r,
        |                  (12345 + j * 99991) % 2147483648 AS b
        |            FROM range(96) t(j)),
        |ab AS (SELECT j, r + (1 - r % 2) AS a, b FROM tj),
        |x1 AS (SELECT ab.j,
        |              ((e.user_id % 2147483648) * ab.a + ab.b) % 2147483648 AS x1
        |       FROM events e, ab),
        |x2 AS (SELECT j, xor(x1, x1 // 32768) AS x2 FROM x1),
        |x3 AS (SELECT j, (x2 * 2246822519) % 2147483648 AS x3 FROM x2),
        |sgn AS (SELECT j, 1 - 2 * (xor(x3, x3 // 8192) % 2) AS s FROM x3),
        |sj AS (SELECT j, sum(s)::BIGINT AS sj FROM sgn GROUP BY j),
        |gm AS (SELECT j // 32 AS g, sum(sj * sj) // 32 AS m FROM sj GROUP BY g),
        |med AS (SELECT (sum(m) - max(m) - min(m))::BIGINT AS ams_est FROM gm),
        |ex AS (SELECT sum(c * c)::BIGINT AS exact_f2
        |       FROM (SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id))
        |SELECT exact_f2, ams_est,
        |       round(abs(ams_est - exact_f2) / CAST(exact_f2 AS DOUBLE), 4) AS rel_err
        |FROM ex, med""".stripMargin) { (s, dir) =>
      val sj = events(s, dir)
        .select(col("user_id"), explode(sequence(lit(0L), lit(95L))).as("j"))
        .withColumn("r", expr("(1103515245L + j * 2654435761L) % 2147483648L"))
        .withColumn("a", expr("r + (1 - r % 2)")) // odd multiplier per estimator
        .withColumn("b", expr("(12345L + j * 99991L) % 2147483648L"))
        // pre-fold user_id to 31 bits: the raw key times a ~2^31
        // multiplier would overflow Long at large key domains (the
        // q_hll_intersect overflow class, fixed the same way)
        .withColumn("x1", expr("((user_id % 2147483648L) * a + b) % 2147483648L"))
        .withColumn("x2", expr("x1 ^ (x1 div 32768)"))
        .withColumn("x3", expr("(x2 * 2246822519L) % 2147483648L"))
        .withColumn("s", expr("1 - 2 * ((x3 ^ (x3 div 8192)) % 2)"))
        .groupBy("j").agg(sum(col("s")).cast("long").as("sj"))
      val med = sj.groupBy(expr("j div 32").as("g"))
        .agg(expr("sum(sj * sj) div 32").as("m"))
        // median of the 3 group means = sum − max − min, exact in integers
        .agg((sum(col("m")) - max(col("m")) - min(col("m"))).cast("long").as("ams_est"))
      val ex = events(s, dir).groupBy("user_id").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).cast("long").as("exact_f2"))
      ex.crossJoin(med)
        .select(col("exact_f2"), col("ams_est"),
          round(abs(col("ams_est") - col("exact_f2")) /
            col("exact_f2").cast("double"), 4).as("rel_err"))
    },

    GraftQuery(
      "q_hll_intersect",
      "A26 (r13): HLL set INTERSECTION by inclusion-exclusion — the audience-overlap " +
        "estimator: distinct (user, day) pairs with a click AND with a purchase, " +
        "estimated as est(A) + est(B) − est(A∪B) from three m=256 register tables " +
        "(the union registers are just the max-merge of rows from either set — " +
        "q_hll_union's property applied sideways), next to the exact intersection. " +
        "The keyed grain (user_id·100000 + epoch-day) keeps the demo non-degenerate " +
        "(every user does every event type; user-DAYS overlap ~36%). This is the " +
        "sketch answer to 'how many entities are in both partitions' at 100 TB: " +
        "3×256 longs instead of two distinct-sets and a join — with the documented " +
        "caveat that inclusion-exclusion COMPOUNDS the ±1.04/√m error of three " +
        "estimates, so m sizes against the expected overlap, not the set sizes.",
      {
        def est(src: String, out: String) =
          s"""${out}_a AS (SELECT count(*) AS present,
             |       sum(1.0 / (1::BIGINT << m)) AS sp FROM $src),
             |$out AS (SELECT CASE WHEN 0.7183 * 65536.0 / (sp + (256 - present)) <= 640.0
             |                 AND 256 - present > 0
             |            THEN 256.0 * ln(256.0 / (256 - present))
             |            ELSE 0.7183 * 65536.0 / (sp + (256 - present)) END AS est
             |         FROM ${out}_a)""".stripMargin
        s"""WITH e AS (SELECT event_type,
           |             user_id * 100000 + date_diff('day', DATE '1970-01-01',
           |               CAST(ts AS DATE)) AS k
           |           FROM events WHERE event_type IN ('click', 'purchase')),
           |x1 AS (SELECT event_type,
           |              ((k % 2147483648) * 2654435761) % 2147483648 AS x1 FROM e),
           |x2 AS (SELECT event_type, xor(x1, x1 // 32768) AS x2 FROM x1),
           |x3 AS (SELECT event_type, (x2 * 2246822519) % 2147483648 AS x3 FROM x2),
           |b AS (SELECT event_type,
           |             xor(x3, x3 // 8192) % 256 AS reg,
           |             xor(x3, x3 // 8192) // 256 AS h2
           |      FROM x3),
           |ra AS (SELECT reg, max($rankLadder) AS m FROM b
           |       WHERE event_type = 'click' GROUP BY reg),
           |rb AS (SELECT reg, max($rankLadder) AS m FROM b
           |       WHERE event_type = 'purchase' GROUP BY reg),
           |ru AS (SELECT reg, max($rankLadder) AS m FROM b GROUP BY reg),
           |${est("ra", "ea")},
           |${est("rb", "eb")},
           |${est("ru", "eu")},
           |xa AS (SELECT count(DISTINCT k) AS n FROM e WHERE event_type = 'click'),
           |xb AS (SELECT count(DISTINCT k) AS n FROM e WHERE event_type = 'purchase'),
           |xi AS (SELECT count(*) AS n FROM
           |        (SELECT k FROM e WHERE event_type = 'click'
           |         INTERSECT SELECT k FROM e WHERE event_type = 'purchase'))
           |SELECT xa.n AS exact_a, xb.n AS exact_b, xi.n AS exact_both,
           |       round(ea.est, 4) AS est_a, round(eb.est, 4) AS est_b,
           |       round(eu.est, 4) AS est_union,
           |       round(ea.est + eb.est - eu.est, 4) AS est_intersect,
           |       round(abs(ea.est + eb.est - eu.est - xi.n) / xi.n, 4) AS rel_err
           |FROM xa, xb, xi, ea, eb, eu""".stripMargin
      }) { (s, dir) =>
      val e = events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"),
          (col("user_id") * 100000L +
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))).as("k"))
        .transform(Q.materialize) // three register passes + exact side share it
      val b = e
        // pre-fold k into 31 bits so the avalanche multiply cannot
        // overflow Long at any corpus scale (the 31-bit hash caps sketch
        // range anyway; the exact side keeps the full key)
        .withColumn("x1", expr("((k % 2147483648L) * 2654435761L) % 2147483648L"))
        .withColumn("x2", expr("x1 ^ (x1 div 32768)"))
        .withColumn("x3", expr("(x2 * 2246822519L) % 2147483648L"))
        .withColumn("g", expr("x3 ^ (x3 div 8192)"))
        .select(col("event_type"), expr("g % 256").as("reg"), expr("g div 256").as("h2"))
        .withColumn("rank", expr(rankLadder))
      def estOf(regs: org.apache.spark.sql.DataFrame, out: String) = regs
        .agg(count(lit(1)).as("present"),
          sum(expr("1.0D / CAST(shiftleft(1L, m) AS DOUBLE)")).as("sp"))
        .select((col("sp") + (lit(256) - col("present"))).as("s"),
          (lit(256) - col("present")).as("zeros"))
        .select(when(lit(0.7183) * 65536.0 / col("s") <= 640.0 && col("zeros") > 0,
          lit(256.0) * log(lit(256.0) / col("zeros")))
          .otherwise(lit(0.7183) * 65536.0 / col("s")).as(out))
      val ea = estOf(b.filter(col("event_type") === "click")
        .groupBy("reg").agg(max(col("rank")).as("m")), "ea")
      val eb = estOf(b.filter(col("event_type") === "purchase")
        .groupBy("reg").agg(max(col("rank")).as("m")), "eb")
      val eu = estOf(b.groupBy("reg").agg(max(col("rank")).as("m")), "eu")
      val xa = e.filter(col("event_type") === "click")
        .agg(countDistinct(col("k")).as("exact_a"))
      val xb = e.filter(col("event_type") === "purchase")
        .agg(countDistinct(col("k")).as("exact_b"))
      val xi = e.groupBy("k").agg(countDistinct(col("event_type")).as("nt"))
        .filter(col("nt") === 2).agg(count(lit(1)).as("exact_both"))
      xa.crossJoin(xb).crossJoin(xi).crossJoin(ea).crossJoin(eb).crossJoin(eu)
        .select(col("exact_a"), col("exact_b"), col("exact_both"),
          round(col("ea"), 4).as("est_a"), round(col("eb"), 4).as("est_b"),
          round(col("eu"), 4).as("est_union"),
          round(col("ea") + col("eb") - col("eu"), 4).as("est_intersect"),
          round(abs(col("ea") + col("eb") - col("eu") - col("exact_both")) /
            col("exact_both"), 4).as("rel_err"))
    },

    GraftQuery(
      "q_k_anonymity",
      "A27 (r13): k-ANONYMITY audit — the re-identification risk report a " +
        "training-data release runs before publishing: rows are grouped into " +
        "quasi-identifier classes (event_type × calendar day × fixed 50-unit value " +
        "band — the attacker-joinable attributes), and for k ∈ {2, 5, 10} the report " +
        "counts equivalence classes smaller than k, the rows inside them (the " +
        "linkable individuals), and that risk mass in integer basis points. A release " +
        "gate reads this to decide suppression/generalization before export. One " +
        "partial+final aggregate over the bounded class space (|types|·|days|·|bands|), " +
        "then the k-grid scans the k-row class frame — never the corpus again. " +
        "All-integer end to end.",
      """WITH q AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                  CAST(floor(value / 50) AS BIGINT) AS vband,
        |                  count(*) AS sz
        |           FROM events GROUP BY 1, 2, 3),
        |n AS (SELECT sum(sz) AS n, count(*) AS classes FROM q),
        |ks AS (SELECT k FROM (VALUES (2), (5), (10)) AS t(k)),
        |r AS (SELECT ks.k, count(CASE WHEN q.sz < ks.k THEN 1 END) AS classes_below,
        |             coalesce(sum(CASE WHEN q.sz < ks.k THEN q.sz END), 0) AS rows_at_risk
        |      FROM ks, q GROUP BY ks.k)
        |SELECT CAST(r.k AS INT) AS k, n.classes::BIGINT AS classes,
        |       r.classes_below::BIGINT AS classes_below,
        |       r.rows_at_risk::BIGINT AS rows_at_risk,
        |       (r.rows_at_risk::BIGINT * 10000) // n.n::BIGINT AS risk_bp
        |FROM r, n ORDER BY k""".stripMargin) { (s, dir) =>
      val q = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value") / 50).cast("long").as("vband"))
        .agg(count(lit(1)).as("sz"))
        .transform(Q.materialize) // k-row class frame, scanned per k
      val n = q.agg(sum(col("sz")).as("n"), count(lit(1)).as("classes"))
      val ks = s.range(0, 3).select(
        expr("element_at(array(2, 5, 10), CAST(id + 1 AS INT))").as("k"))
      ks.crossJoin(q)
        .groupBy("k")
        .agg(count(when(col("sz") < col("k"), 1)).as("classes_below"),
          coalesce(sum(when(col("sz") < col("k"), col("sz"))), lit(0L)).as("rows_at_risk"))
        .crossJoin(broadcast(n))
        .select(col("k").cast("int").as("k"), col("classes").cast("bigint").as("classes"),
          col("classes_below").cast("bigint").as("classes_below"),
          col("rows_at_risk").cast("bigint").as("rows_at_risk"),
          expr("(rows_at_risk * 10000) div n").as("risk_bp"))
        .orderBy("k")
    },

    GraftQuery(
      "q_l_diversity",
      "A28 (r13): l-DIVERSITY audit — the homogeneity half of the privacy pair with " +
        "A27: a k-anonymous class still leaks when every member shares one SENSITIVE " +
        "value (the attacker learns it without identifying anyone). Same " +
        "quasi-identifier grid as q_k_anonymity (event_type × day × value band), " +
        "sensitive attribute = the user's event row's user_id bucket (a stand-in for " +
        "diagnosis/salary in the classic formulation): for l ∈ {2, 3, 5} the classes " +
        "whose distinct-sensitive count is below l, the rows inside them, and the " +
        "homogeneous-class count (exactly one sensitive value — the total-disclosure " +
        "set). One aggregate computes class size + distinct sensitive values per " +
        "class; the l-grid scans the bounded class frame. All-integer.",
      """WITH q AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |                  CAST(floor(value / 50) AS BIGINT) AS vband,
        |                  count(*) AS sz,
        |                  count(DISTINCT user_id % 10) AS sens
        |           FROM events GROUP BY 1, 2, 3),
        |n AS (SELECT sum(sz) AS n, count(*) AS classes,
        |             sum(CASE WHEN sens = 1 THEN 1 ELSE 0 END)::BIGINT AS homogeneous
        |      FROM q),
        |ls AS (SELECT l FROM (VALUES (2), (3), (5)) AS t(l)),
        |r AS (SELECT ls.l, count(CASE WHEN q.sens < ls.l THEN 1 END) AS classes_below,
        |             coalesce(sum(CASE WHEN q.sens < ls.l THEN q.sz END), 0) AS rows_at_risk
        |      FROM ls, q GROUP BY ls.l)
        |SELECT CAST(r.l AS INT) AS l, n.classes::BIGINT AS classes,
        |       n.homogeneous,
        |       r.classes_below::BIGINT AS classes_below,
        |       r.rows_at_risk::BIGINT AS rows_at_risk,
        |       (r.rows_at_risk::BIGINT * 10000) // n.n::BIGINT AS risk_bp
        |FROM r, n ORDER BY l""".stripMargin) { (s, dir) =>
      val q = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          floor(col("value") / 50).cast("long").as("vband"))
        .agg(count(lit(1)).as("sz"),
          countDistinct(expr("user_id % 10")).as("sens"))
        .transform(Q.materialize) // bounded class frame, scanned per l
      val n = q.agg(sum(col("sz")).as("n"), count(lit(1)).as("classes"),
        sum(when(col("sens") === 1, 1L).otherwise(0L)).as("homogeneous"))
      val ls = s.range(0, 3).select(
        expr("element_at(array(2, 3, 5), CAST(id + 1 AS INT))").as("l"))
      ls.crossJoin(q)
        .groupBy("l")
        .agg(count(when(col("sens") < col("l"), 1)).as("classes_below"),
          coalesce(sum(when(col("sens") < col("l"), col("sz"))), lit(0L)).as("rows_at_risk"))
        .crossJoin(broadcast(n))
        .select(col("l").cast("int").as("l"),
          col("classes").cast("bigint").as("classes"),
          col("homogeneous").cast("bigint").as("homogeneous"),
          col("classes_below").cast("bigint").as("classes_below"),
          col("rows_at_risk").cast("bigint").as("rows_at_risk"),
          expr("(rows_at_risk * 10000) div n").as("risk_bp"))
        .orderBy("l")
    },
  )

  /** Width-parameterized HyperLogLog key builder (A18 at m = 64, A21 at
    * m = 256 — r12, VERDICT r11 #8): identical avalanche hash and
    * trailing-zero rank ladder at any power-of-two register count.
    * `alphaStr` is the bias-correction constant interpolated VERBATIM
    * into both engines (decimal-literal → nearest double is IEEE-identical
    * parsing), so the whole estimator stays textually replayable; the
    * linear-counting threshold 2.5m and alpha·m² are derived integers.
    * State per group is m longs — the error/memory dial a deployment
    * turns (1.04/√m standard error), with the shuffle volume still
    * constant in corpus size.
    */
  private def hllSketch(name: String, m: Int, alphaStr: String,
      desc: String): GraftQuery = {
    require(Integer.bitCount(m) == 1, s"HLL register count must be a power of two, got $m")
    val m2 = m.toLong * m         // alpha·m² numerator
    val lc = (5L * m) / 2         // 2.5m linear-counting threshold (exact)
    val alpha = alphaStr.toDouble
    GraftQuery(name, desc,
      s"""WITH x1 AS (SELECT event_type,
         |              (user_id * 2654435761) % 2147483648 AS x1 FROM events),
         |x2 AS (SELECT event_type, xor(x1, x1 // 32768) AS x2 FROM x1),
         |x3 AS (SELECT event_type, (x2 * 2246822519) % 2147483648 AS x3 FROM x2),
         |b AS (SELECT event_type,
         |             xor(x3, x3 // 8192) % $m AS reg,
         |             xor(x3, x3 // 8192) // $m AS h2
         |      FROM x3),
         |r AS (SELECT event_type, reg, max($rankLadder) AS m
         |      FROM b GROUP BY event_type, reg),
         |a AS (SELECT event_type, count(*) AS present,
         |             sum(1.0 / (1::BIGINT << m)) AS sp
         |      FROM r GROUP BY event_type),
         |e AS (SELECT event_type,
         |             sp + ($m - present) AS s, $m - present AS zeros FROM a),
         |est AS (SELECT event_type,
         |               CASE WHEN $alphaStr * $m2.0 / s <= $lc.0 AND zeros > 0
         |                    THEN $m.0 * ln($m.0 / zeros)
         |                    ELSE $alphaStr * $m2.0 / s END AS est
         |        FROM e),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
         |      FROM events GROUP BY event_type)
         |SELECT x.event_type, x.n_exact, round(est.est, 4) AS hll_est,
         |       round(abs(est.est - x.n_exact) / x.n_exact, 4) AS rel_err
         |FROM x JOIN est USING (event_type) ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      val b = events(s, dir)
        .withColumn("x1", expr("(user_id * 2654435761L) % 2147483648L"))
        .withColumn("x2", expr("x1 ^ (x1 div 32768)"))
        .withColumn("x3", expr("(x2 * 2246822519L) % 2147483648L"))
        .withColumn("g", expr("x3 ^ (x3 div 8192)"))
        .select(col("event_type"),
          expr(s"g % $m").as("reg"), expr(s"g div $m").as("h2"))
      val r = b.withColumn("rank", expr(rankLadder))
        .groupBy("event_type", "reg").agg(max(col("rank")).as("m"))
      val e = r.groupBy("event_type")
        .agg(count(lit(1)).as("present"),
          sum(expr("1.0D / CAST(shiftleft(1L, m) AS DOUBLE)")).as("sp"))
        .select(col("event_type"),
          (col("sp") + (lit(m) - col("present"))).as("s"),
          (lit(m) - col("present")).as("zeros"))
        .select(col("event_type"),
          when(lit(alpha) * m2.toDouble / col("s") <= lc.toDouble && col("zeros") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
            .otherwise(lit(alpha) * m2.toDouble / col("s")).as("est"))
      events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .join(e, "event_type")
        .select(col("event_type"), col("n_exact"),
          round(col("est"), 4).as("hll_est"),
          round(abs(col("est") - col("n_exact")) / col("n_exact"), 4).as("rel_err"))
        .orderBy("event_type")
    }
  }

  /** Count-Min hash-row constants (pairwise-independent-enough LCGs over
    * the shared mod-1e9+7 convention); declared before use in `all` via
    * lazy — see [[rankLadder]]. */
  private[graft] lazy val CmsA = Seq(1103515245L, 1000003L, 2654435761L, 2246822519L)
  private[graft] lazy val CmsB = Seq(12345L, 54321L, 7L, 99991L)

  /** Trailing-zeros-plus-one rank of h2 (HLL register rank), as ONE CASE
    * ladder string both engines parse and fold identically — h2 = 0 falls
    * through every branch to the 25 cap (h < 1e9+7 / 64 < 2^24).
    * lazy: declared after `all`, which interpolates it at object init. */
  private lazy val rankLadder: String =
    (1 to 24).map(i =>
      s"WHEN h2 % ${1L << i} = ${1L << (i - 1)} THEN $i").mkString(
      "CASE ", " ", " ELSE 25 END")
}
