package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** T10 fault recovery: a restarted query resumes from its checkpoint —
  * tick-counter offsets replay exactly the unprocessed range, no
  * duplicates and no gaps (ref reconnect-loop, InfluxConnector2.py:187-195).
  */
class CheckpointRestartSpec extends SparkTestBase {

  test("restart from checkpoint continues the tick sequence without duplicates") {
    val ckpt = Files.createTempDirectory("s7ckpt").toString
    val out = Files.createTempDirectory("s7out").toString

    def runOnce(): Unit = {
      val q = Pipelines.s7DecodedStream(spark, Seq("10.0.0.1"), tagsPerPlc = 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }

    runOnce()   // drains the available ticks
    runOnce()   // NEW query instance, same checkpoint → resumes after them
    runOnce()

    import org.apache.spark.sql.functions._
    val rows = spark.read.parquet(out)
    val total = rows.count()
    val ticks = rows.select("ts").distinct().count()
    // exactly-once: 2 tags per tick, no replayed (ts, alias) pairs
    assert(total === ticks * 2)
    assert(rows.select("ts", "alias").distinct().count() === total)
    // gapless resume: tick timestamps are contiguous at the 1s cadence
    val span = rows.agg((unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("d"))
      .head().getLong(0)
    assert(span === (ticks - 1) * 1000)
    assert(ticks >= 3)
  }
}
