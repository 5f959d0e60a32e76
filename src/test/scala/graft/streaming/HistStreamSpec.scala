package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T22: the streaming histogram-quantile monitor reproduces the batch
  * q_hist_quantiles inversion exactly — the terminal p50/p99 bin lower
  * bounds after several micro-batches equal the oracle-verified batch
  * key over the same rows (same cents conversion, same fixed bins, same
  * integer rank inversion), the emit volume is bounded (a no-move batch
  * emits nothing), and state stays one bounded bin map per group no
  * matter how many rows stream through.
  */
class HistStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("multi-batch terminal p50/p99 match the batch q_hist_quantiles bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = graft.tables.Tables.lineitem(spark, dir)
      .select("l_extendedprice").as[Double].collect().toSeq.map(("prices", _))
    val ms = MemoryStream[(String, Double)]
    val q = Pipelines.histQuantileMonitor(ms.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("hist_out").outputMode("append").start()
    rows.grouped(math.max(1, rows.size / 4 + 1)).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val terminal = spark.table("hist_out").as[HistQuantileEstimate]
      .collect().maxBy(_.n_rows)
    // at minRelDelta=0 the last EMITTED estimate is always current even
    // when the final chunk moves nothing (the emit gate withholds only
    // no-change batches), so parity below holds regardless; n_rows just
    // can't exceed the feed
    assert(terminal.n_rows <= rows.size.toLong)
    val batch = graft.Registry.byName("q_hist_quantiles").run(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap // p -> est_lo_cents
    assert(terminal.p50_lo_cents === batch(500),
      s"p50 streamed ${terminal.p50_lo_cents} vs batch ${batch(500)}")
    assert(terminal.p99_lo_cents === batch(990),
      s"p99 streamed ${terminal.p99_lo_cents} vs batch ${batch(990)}")
  }

  test("quantile-stable micro-batches emit nothing; a tail shift emits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val q = Pipelines.histQuantileMonitor(ms.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName("hist_band").outputMode("append").start()
    // 5000 values uniform over one bin-aligned region: p50/p99 settle
    ms.addData((0 until 5000).map(i => ("m", (i % 100) * 26.0))); q.processAllAvailable()
    val first = spark.table("hist_band").count()
    assert(first === 1L)
    // replay the same distribution — bin shares unchanged, estimates
    // cannot move by more than intra-bin noise; assert NO emission when
    // the inverted bins are identical
    ms.addData((0 until 5000).map(i => ("m", (i % 100) * 26.0))); q.processAllAvailable()
    assert(spark.table("hist_band").count() === first,
      "a distribution-preserving micro-batch must not emit")
    // inject a heavy upper tail: p99 (and p50) jump bins — emits
    ms.addData((0 until 20000).map(i => ("m", 9000.0 + (i % 10)))); q.processAllAvailable()
    assert(spark.table("hist_band").count() === first + 1)
    q.stop()
  }
}
