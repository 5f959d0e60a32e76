package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp
import java.time.Instant

case class Doc(doc_id: Long, ts: Timestamp, text: String)

/** r10: the streaming twin of q_dedup_incremental's exact layer —
  * snapshot hits are dropped by the stream-static anti join, within-stream
  * repeats are dropped by watermark-bounded state, and fresh docs pass.
  * Repeats are exercised ACROSS micro-batches so the state store (not
  * batch-local dedup) is what the assertion proves.
  */
class IncrementalDedupSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L))

  test("snapshot hits drop, in-stream repeats drop across batches, fresh docs pass") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val snapshot = Seq((100L, "already ingested doc"), (101L, "another old doc"))
      .toDF("doc_id", "text")
    val ms = MemoryStream[Doc]
    val q = Pipelines.incrementalDedup(ms.toDF(), snapshot, "30 seconds")
      .writeStream.format("memory").queryName("incdedup_out").outputMode("append").start()
    try {
      // batch 1: one snapshot dup, one fresh doc
      ms.addData(
        Doc(1, ts(1), "already ingested doc"),
        Doc(2, ts(2), "a brand new doc"))
      q.processAllAvailable()
      // batch 2: repeats doc 2's text (cross-batch state hit), one fresh
      ms.addData(
        Doc(3, ts(3), "a brand new doc"),
        Doc(4, ts(4), "a second new doc"))
      q.processAllAvailable()
      val kept = spark.table("incdedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 4L),
        s"expected snapshot dup (1) and cross-batch repeat (3) dropped, got $kept")
    } finally { q.stop() }
  }
}
