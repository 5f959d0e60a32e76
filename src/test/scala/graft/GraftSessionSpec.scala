package graft

import graft.functions.EmaAggregator
import org.apache.spark.sql.functions._

/** The pure-SQL entry point: views + native functions reachable from
  * spark.sql alone, matching their DataFrame twins.
  */
class GraftSessionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("init registers every table as a view and the native functions in SQL") {
    GraftSession.init(spark, dir)
    GraftSession.TableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").collect()(0).getLong(0) > 0, t)
    }
    // native expressions straight from SQL over the views
    val r = spark.sql(
      """SELECT vec_cos(e.embedding, e.embedding) AS self_cos,
        |       poly_hash('abc') AS ph,
        |       size(token_hashes(array('a', 'b'))) AS nth
        |FROM embeddings e WHERE e.vec_id = 0""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // ('a'*31 + 'b')*31 + 'c'  mod 1e9+7 — the documented polynomial
    assert(r.getLong(1) === ((('a'.toLong * 31 + 'b') * 31) + 'c') % 1000000007L)
    assert(r.getInt(2) === 2)
  }

  test("SQL ema equals the typed Aggregator fold") {
    GraftSession.init(spark, dir)
    val sql = spark.sql(
      """SELECT user_id, ema(user_id, unix_micros(ts), event_id, value) AS ema
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin).collect()
    import spark.implicits._
    val typed = tables.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .agg(new EmaAggregator(0.3).toColumn.name("ema"))
      .collect().sortBy(_._1)
    assert(sql.map(r => (r.getLong(0), r.getDouble(1))).toSeq === typed.toSeq)
  }
}
