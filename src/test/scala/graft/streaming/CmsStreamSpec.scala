package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** T21: the streaming Count-Min watch-list monitor reproduces the batch
  * sketch exactly — terminal estimates equal a batch-built grid over the
  * same rows (the grid merges by addition across micro-batches), the
  * one-sided CMS invariant (est ≥ exact) holds at every emission, and the
  * state is 4×512 counters per group no matter how many keys stream by.
  */
class CmsStreamSpec extends SparkTestBase {

  import graft.queries.QAgg.{CmsA, CmsB}

  private def cells(u: Long): Seq[Int] =
    CmsA.indices.map(i => (((CmsA(i) * u + CmsB(i)) % 1000000007L) % 512L).toInt)

  /** Batch twin: the grid built in one pass over all rows. */
  private def batchGrid(us: Seq[Long]): Array[Long] = {
    val g = new Array[Long](4 * 512)
    us.foreach { u =>
      val cs = cells(u); CmsA.indices.foreach(i => g(i * 512 + cs(i)) += 1L)
    }
    g
  }

  test("multi-batch terminal estimates equal the batch grid; est >= exact always") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(17)
    // skewed stream: watch keys 1..5 get heavy traffic, 3000 background keys
    val watch = Seq(1L, 2L, 3L, 4L, 5L)
    val rows = (0 until 9000).map { i =>
      val u = if (i % 3 == 0) (i % 5 + 1).toLong else 100L + rnd.nextInt(3000)
      ("m", u)
    }
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.cmsMonitor(ms.toDF().toDF("event_type", "user_id"), watch)
      .writeStream.format("memory").queryName("cms_out").outputMode("append").start()
    rows.grouped(3000).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    q.stop()
    val out = spark.table("cms_out").as[CmsEstimate].collect()
    // one row per watched key per batch
    assert(out.length === watch.size * 3)
    // one-sided error at EVERY emission: estimate >= exact count so far
    val exactTotal = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val terminal = out.filter(_.n_rows == rows.size.toLong)
    assert(terminal.length === watch.size)
    terminal.foreach { e =>
      assert(e.cms_est >= exactTotal.getOrElse(e.user_id, 0L),
        s"key ${e.user_id}: CMS ${e.cms_est} below exact ${exactTotal(e.user_id)}")
    }
    // terminal estimates == the batch grid over the same rows
    val g = batchGrid(rows.map(_._2))
    terminal.foreach { e =>
      val cs = cells(e.user_id)
      val expect = CmsA.indices.map(i => g(i * 512 + cs(i))).min
      assert(e.cms_est === expect, s"key ${e.user_id}")
    }
  }

  test("a micro-batch that touches none of a watched key's cells emits nothing for it (r12)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val watched = 42L
    val wc = cells(watched)
    // a background key whose four cells are row-wise disjoint from the
    // watched key's — its traffic cannot move the watched estimate
    val quietKey = (1000L to 5000L).find { u =>
      val cs = cells(u); CmsA.indices.forall(i => cs(i) != wc(i))
    }.get
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.cmsMonitor(ms.toDF().toDF("event_type", "user_id"), Seq(watched))
      .writeStream.format("memory").queryName("cms_quiet").outputMode("append").start()
    ms.addData(Seq(("m", watched), ("m", watched))); q.processAllAvailable()
    assert(spark.table("cms_quiet").count() === 1L) // first estimate emits
    ms.addData((0 until 50).map(_ => ("m", quietKey))); q.processAllAvailable()
    assert(spark.table("cms_quiet").count() === 1L,
      "background traffic off the watched cells must not replay the watch list")
    // watched traffic moves the estimate again → emits
    ms.addData(Seq(("m", watched))); q.processAllAvailable()
    assert(spark.table("cms_quiet").count() === 2L)
    q.stop()
  }

  test("watched key absent from the stream reports its collision floor, never negative") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val q = Pipelines.cmsMonitor(ms.toDF().toDF("event_type", "user_id"), Seq(999999L))
      .writeStream.format("memory").queryName("cms_out2").outputMode("append").start()
    ms.addData((0 until 500).map(i => ("m", i.toLong)))
    q.processAllAvailable()
    q.stop()
    val e = spark.table("cms_out2").as[CmsEstimate].collect().head
    val g = batchGrid((0 until 500).map(_.toLong))
    val cs = cells(999999L)
    assert(e.cms_est === CmsA.indices.map(i => g(i * 512 + cs(i))).min)
    assert(e.cms_est >= 0L)
  }
}
