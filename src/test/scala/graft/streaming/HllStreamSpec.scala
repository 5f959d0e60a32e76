package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T20: the streaming HLL cardinality monitor reproduces the batch
  * q_hll_sketch estimate exactly — the terminal per-group estimate after
  * several micro-batches equals the batch key over the same rows (same
  * avalanche hash, same register fold, same estimator branches), and the
  * sketch state stays 64 registers per group no matter how many distinct
  * keys stream through.
  */
class HllStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("multi-batch terminal estimates match the batch q_hll_sketch bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.tables.Tables.events(spark, dir)
      .select("event_type", "user_id").as[(String, Long)].collect().toSeq
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.hllMonitor(ms.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("hll_out").outputMode("append").start()
    rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    // terminal = the LAST emitted row per group (largest n_rows)
    val streamed = spark.table("hll_out").as[HllEstimate].collect()
      .groupBy(_.event_type).view.mapValues(_.maxBy(_.n_rows)).toMap
    val batch = graft.Registry.byName("q_hll_sketch").run(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed.keySet === batch.keySet)
    for ((etype, (_, est)) <- batch) {
      val got = BigDecimal(streamed(etype).hll_est)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got === est, s"$etype: streamed $got vs batch $est")
    }
    // per-row totals add up across batches
    val nTotal = streamed.values.map(_.n_rows).sum
    assert(nTotal === rows.size.toLong)
  }

  test("estimates refine monotonically in n_rows and state stays 64 registers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.hllMonitor(ms.toDF().toDF("event_type", "user_id"))
      .writeStream.format("memory").queryName("hll_out2").outputMode("append").start()
    // 3 batches of 2000 distinct keys each — a streaming COUNT(DISTINCT)
    // would hold 6000 keys of state; the sketch holds 64 ints
    (0 until 3).foreach { b =>
      ms.addData((0 until 2000).map(i => ("m", (b * 2000 + i).toLong)))
      q.processAllAvailable()
    }
    q.stop()
    val ests = spark.table("hll_out2").as[HllEstimate].collect().sortBy(_.n_rows)
    assert(ests.length === 3)
    // each batch adds 2000 NEW keys: the estimate must grow with each batch
    assert(ests.sliding(2).forall { case Array(a, b) => b.hll_est > a.hll_est })
    // 6000 distinct keys into 64 registers: estimate within the ~13% sigma band ×3
    val fin = ests.last.hll_est
    assert(fin > 6000 * 0.6 && fin < 6000 * 1.4, s"terminal estimate $fin vs 6000 truth")
  }
}
