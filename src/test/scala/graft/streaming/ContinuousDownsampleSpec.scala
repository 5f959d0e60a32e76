package graft.streaming

import graft.SparkTestBase
import graft.sinks.PointStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp
import java.time.{Instant, LocalDate}

/** The continuous-query + retention surface (InfluxDB CQs and retention
  * policies, ref README.md:3,13): streaming rollups materialize windows
  * exactly once after the watermark closes them, and retention expiry
  * drops whole date partitions.
  */
class ContinuousDownsampleSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L))

  test("continuous downsample materializes finalized 1-minute windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("cq_out").toString
    val ckpt = Files.createTempDirectory("cq_ckpt").toString
    val ms = MemoryStream[Ev]
    val q = Pipelines.continuousDownsample(ms.toDF(), out, ckpt)
    ms.addData(
      Ev(0, ts(0), 1, "click", 10.0), Ev(1, ts(0), 2, "click", 30.0),
      Ev(2, ts(1), 1, "view", 50.0))
    q.processAllAvailable()
    ms.addData(Ev(9, ts(60), 9, "flush", 0.0)) // watermark past all windows
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
      .select(date_format(col("wstart"), "HH:mm").as("w"), col("event_type"),
        col("mean_value"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(rows.contains(("00:00", "click", 20.0, 2L)))
    assert(rows.contains(("00:01", "view", 50.0, 1L)))
  }

  test("retention expiry drops date partitions older than the TTL") {
    val root = Files.createTempDirectory("retention").toString
    Seq("2024-01-01", "2024-01-05", "2024-01-10").foreach { d =>
      val p = new java.io.File(s"$root/measurement=plc-1/date=$d")
      p.mkdirs()
      Files.writeString(p.toPath.resolve("part-0.parquet"), "stub")
    }
    val deleted = PointStore.expireRetention(root, ttlDays = 7,
      today = LocalDate.parse("2024-01-11"))
    assert(deleted.map(p => p.substring(p.length - 10)) === Seq("2024-01-01"))
    val left = new java.io.File(s"$root/measurement=plc-1").listFiles().map(_.getName).sorted
    assert(left === Array("date=2024-01-05", "date=2024-01-10"))
  }
}
