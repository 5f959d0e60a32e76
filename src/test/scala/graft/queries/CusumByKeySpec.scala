package graft.queries

import graft.SparkTestBase
import graft.functions.Cusum
import org.apache.spark.sql.functions._

/** Pins the r10 streaming CUSUM (functions/Cusum.scala — repartition +
  * sortWithinPartitions + group-adjacent fold, O(1) state per series)
  * byte-equal to the r9 collect_list + aggregate-HOF spelling it replaced,
  * on the real testdata and on adversarial inline frames.
  */
class CusumByKeySpec extends SparkTestBase {

  /** The r9 spelling, kept here as the reference twin. */
  private def hofCusum(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_ns"), col("event_id"), col("value")))).as("pts"))
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
      .select(col("user_id"), col("st.sp").as("cusum_pos"), col("st.sn").as("cusum_neg"),
        col("st.alarms").as("alarms"), size(col("vals")).cast("bigint").as("n_points"))

  private def streamCusum(df: org.apache.spark.sql.DataFrame) =
    Cusum.cusumByKey(df.select(col("user_id"), col("ts_ns"), col("event_id"), col("value")),
      target = 50.0, slack = 2.0, band = 100.0).toDF()

  test("streaming fold == collect_list HOF spelling on the real events table") {
    val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val a = streamCusum(ev).orderBy("user_id").collect()
    val b = hofCusum(ev).orderBy("user_id").collect()
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("equal-timestamp rows fold in event_id order on both paths") {
    import spark.implicits._
    // Two rows share ts; (160 then 30) vs (30 then 160) end in different
    // terminal states, so a wrong tie-break shows up in cusum_pos.
    val df = Seq(
      (7L, 1000L, 2L, 30.0), (7L, 1000L, 1L, 160.0), (7L, 2000L, 3L, 55.0),
      (8L, 1000L, 5L, 160.0), (8L, 1000L, 4L, 30.0))
      .toDF("user_id", "ts_ns", "event_id", "value")
    val a = streamCusum(df).orderBy("user_id").collect()
    val b = hofCusum(df).orderBy("user_id").collect()
    assert(a.toSeq === b.toSeq)
    // And against the hand fold for key 7: 160 → s+=108; 30 → s+=86; 55 → s+=89
    val k7 = a.find(_.getLong(0) == 7L).get
    assert(k7.getDouble(1) === 89.0 && k7.getLong(3) === 1L && k7.getLong(4) === 3L)
  }

  test("series split across input partitions still folds as one run after the repartition") {
    import spark.implicits._
    // 200 points for one key scattered over 8 input partitions; expected
    // terminal state computed by a local fold.
    val vals = (1 to 200).map(i => (1L, i.toLong * 1000, i.toLong, (i % 97).toDouble))
    val df = spark.createDataset(vals).repartition(8)
      .toDF("user_id", "ts_ns", "event_id", "value")
    var sp = 0.0; var sn = 0.0; var alarms = 0L
    vals.sortBy(v => (v._2, v._3)).foreach { case (_, _, _, v) =>
      sp = math.max(0.0, sp + (v - 50.0) - 2.0)
      sn = math.max(0.0, sn - (v - 50.0) - 2.0)
      if (sp > 100.0 || sn > 100.0) alarms += 1
    }
    val row = streamCusum(df).collect().head
    assert(row.getDouble(1) === sp && row.getDouble(2) === sn)
    assert(row.getLong(3) === alarms && row.getLong(4) === 200L)
  }
}
