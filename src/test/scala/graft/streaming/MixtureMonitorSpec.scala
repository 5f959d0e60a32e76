package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

case class DocEv(ts: Timestamp, source: String, n_tokens: Long)

/** T16: the mixture-drift monitor closes each window on the watermark,
  * reports every source's token share against its target (including
  * targeted sources absent from the window), and flags drift beyond tol.
  */
class MixtureMonitorSpec extends SparkTestBase {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(minute * 60L + sec))

  test("skewed window drifts, balanced window does not, absent target alerts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[DocEv]
    val targets = Map("src0" -> 0.5, "src1" -> 0.5)
    val q = Pipelines.mixtureMonitor(ms.toDF(), targets, tol = 0.1,
        windowMs = 60000L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("mix_out").outputMode("append").start()

    def rows() = spark.table("mix_out").as[MixtureDrift].collect().toList

    // window 0: src0 floods (90 of 100 tokens) and src1 starves
    ms.addData(DocEv(ts(0, 10), "src0", 50L), DocEv(ts(0, 20), "src0", 40L),
      DocEv(ts(0, 30), "src1", 10L))
    q.processAllAvailable()
    assert(rows().isEmpty) // watermark still inside the window

    // window 2 data pushes the watermark past window 0's end...
    ms.addData(DocEv(ts(2, 0), "src0", 30L), DocEv(ts(2, 1), "src1", 30L))
    q.processAllAvailable()
    // ...and the timeout fires on the following batch (the deadman cadence)
    ms.addData(DocEv(ts(2, 2), "src1", 0L))
    q.processAllAvailable()
    val w0 = rows().filter(_.window_start == ts(0)).sortBy(_.source)
    assert(w0 === List(
      MixtureDrift(ts(0), "src0", 90L, 100L, 0.9, 0.5, drifted = true),
      MixtureDrift(ts(0), "src1", 10L, 100L, 0.1, 0.5, drifted = true)))

    // window 4: only src0 reports → src1 must still emit (share 0, drifted)
    ms.addData(DocEv(ts(4, 0), "src0", 20L))
    q.processAllAvailable()
    ms.addData(DocEv(ts(6, 0), "src0", 1L))
    q.processAllAvailable()
    ms.addData(DocEv(ts(6, 1), "src0", 1L))
    q.processAllAvailable()
    q.stop()
    val w2 = rows().filter(_.window_start == ts(2)).sortBy(_.source)
    // balanced 30/60 + 30/60 (the 0-token row adds nothing): no drift
    assert(w2 === List(
      MixtureDrift(ts(2), "src0", 30L, 60L, 0.5, 0.5, drifted = false),
      MixtureDrift(ts(2), "src1", 30L, 60L, 0.5, 0.5, drifted = false)))
    val w4 = rows().filter(_.window_start == ts(4)).sortBy(_.source)
    assert(w4 === List(
      MixtureDrift(ts(4), "src0", 20L, 20L, 1.0, 0.5, drifted = true),
      MixtureDrift(ts(4), "src1", 0L, 20L, 0.0, 0.5, drifted = true)))
  }

  test("in-flight window state survives a checkpointed restart") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("mixckpt").toString
    val out = java.nio.file.Files.createTempDirectory("mixout").toString
    val ms = MemoryStream[DocEv]
    def start() = Pipelines.mixtureMonitor(ms.toDF(), Map("src0" -> 0.5, "src1" -> 0.5),
        tol = 0.1, windowMs = 60000L, watermark = "0 seconds")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // run 1 accumulates window 0 (still open: watermark inside it), stops
    val q1 = start()
    ms.addData(DocEv(ts(0, 10), "src0", 90L), DocEv(ts(0, 20), "src1", 10L))
    q1.processAllAvailable()
    q1.stop()

    // run 2 resumes from the checkpoint; new data closes window 0, whose
    // counts were accumulated entirely before the restart
    val q2 = start()
    ms.addData(DocEv(ts(2, 0), "src0", 5L))
    q2.processAllAvailable()
    ms.addData(DocEv(ts(2, 1), "src0", 5L))
    q2.processAllAvailable()
    q2.stop()

    val w0 = spark.read.parquet(out).as[MixtureDrift].collect().toList
      .filter(_.window_start == ts(0)).sortBy(_.source)
    assert(w0 === List(
      MixtureDrift(ts(0), "src0", 90L, 100L, 0.9, 0.5, drifted = true),
      MixtureDrift(ts(0), "src1", 10L, 100L, 0.1, 0.5, drifted = true)))
  }
}
