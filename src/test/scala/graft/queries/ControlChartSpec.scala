package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the r9 additions: the CUSUM control-chart fold
  * (q_cusum), the OHLC candlestick downsample (q_ohlc), and the per-document
  * token-entropy signal (q_doc_entropy). The registry queries run against the
  * driver's parquet tables; these specs pin the operator SEMANTICS on tiny
  * inline frames where the expected values are computable by hand.
  */
class ControlChartSpec extends SparkTestBase {

  test("CUSUM fold: s+/s- recurrence with slack, alarms counted after each update") {
    import spark.implicits._
    // target 50, k=2, h=100 (the q_cusum constants).
    // values: 160, 160, 30
    //   s+ : max(0, 0+110-2)=108 → max(0, 108+110-2)=216 → max(0, 216-20-2)=194
    //   s- : max(0, 0-110-2)=0   → 0                     → max(0, 0+20-2)=18
    //   alarms: 108>100 → 1; 216>100 → 2; 194>100 → 3
    val df = Seq((1L, 1L, 160.0), (1L, 2L, 160.0), (1L, 3L, 30.0))
      .toDF("user_id", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("event_id") * 1000000L))
    val st = df.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"), col("value")))).as("pts"))
      .withColumn("vals", expr("transform(pts, p -> p.value)"))
      .withColumn("st", expr(
        """aggregate(vals,
          |  named_struct('sp', 0.0D, 'sn', 0.0D, 'alarms', 0L),
          |  (a, v) -> named_struct(
          |    'sp', greatest(0.0D, a.sp + (v - 50.0D) - 2.0D),
          |    'sn', greatest(0.0D, a.sn - (v - 50.0D) - 2.0D),
          |    'alarms', a.alarms + (CASE WHEN greatest(0.0D, a.sp + (v - 50.0D) - 2.0D) > 100.0D
          |                                 OR greatest(0.0D, a.sn - (v - 50.0D) - 2.0D) > 100.0D
          |                          THEN 1L ELSE 0L END)))""".stripMargin))
      .select("st.sp", "st.sn", "st.alarms").head()
    assert(st.getDouble(0) === 194.0)
    assert(st.getDouble(1) === 18.0)
    assert(st.getLong(2) === 3L)
  }

  test("OHLC: open/close pick earliest/latest point with event_id tie-break inside the bucket") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // One hourly bucket; two points share ts=... :00:10 → event_id breaks the tie.
    val df = Seq(
      (1L, 10_000_000L, 1L, 5.0),  // earliest ts, lowest event_id → open
      (1L, 10_000_000L, 2L, 9.0),
      (1L, 20_000_000L, 3L, 1.0),  // low
      (1L, 30_000_000L, 4L, 7.0)   // latest ts → close
    ).toDF("user_id", "tsu", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("tsu")))
      .withColumn("t", date_trunc("hour", col("ts")))
    val wa = Window.partitionBy("user_id", "t").orderBy(col("ts").asc, col("event_id").asc)
    val wd = Window.partitionBy("user_id", "t").orderBy(col("ts").desc, col("event_id").desc)
    val row = df.withColumn("rn_a", row_number().over(wa))
      .withColumn("rn_d", row_number().over(wd))
      .groupBy("user_id", "t")
      .agg(max(when(col("rn_a") === 1, col("value"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(when(col("rn_d") === 1, col("value"))).as("close"),
        count(lit(1)).as("n"))
      .head()
    assert(row.getAs[Double]("open") === 5.0)
    assert(row.getAs[Double]("high") === 9.0)
    assert(row.getAs[Double]("low") === 1.0)
    assert(row.getAs[Double]("close") === 7.0)
    assert(row.getAs[Long]("n") === 4L)
  }

  test("token entropy: uniform tokens hit ln(k); constant doc hits 0; TTR = kinds/n") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Seq(
      (1L, "a b c d"),   // 4 distinct × p=1/4 → entropy ln(4), ttr 1.0
      (2L, "x x x x")    // 1 distinct → entropy 0, ttr 0.25
    ).toDF("doc_id", "text")
    val f = docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
    val wDoc = Window.partitionBy("doc_id")
    val p = col("c").cast("double") / col("n")
    val out = f.withColumn("n", sum(col("c")).over(wDoc))
      .withColumn("kinds", count(lit(1)).over(wDoc))
      .groupBy("doc_id")
      .agg(round(-sum(p * log(p)), 4).as("entropy"),
        round(max(col("kinds")).cast("double") / max(col("n")), 4).as("ttr"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 1.3863) // round(ln 4, 4)
    assert(out(1L)._2 === 1.0)
    assert(out(2L)._1 === 0.0)
    assert(out(2L)._2 === 0.25)
  }
}
