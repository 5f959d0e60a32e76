package graft.streaming

import graft.SparkTestBase
import graft.sources.ConfigXml
import graft.queries.QCustom
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

case class Point(ts: Timestamp, measurement: String, alias: String, value: Double)

/** T2 architecture: one StreamingQuery per interval group, each writing
  * batched line-protocol (T1 trigger cadence, S3 sink).
  */
class IntervalFanOutSpec extends SparkTestBase {

  test("fan-out starts one query per active interval group and sinks lines") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tags = ConfigXml.parseString(QCustom.SampleConfigXml)
    val out = Files.createTempDirectory("lp_out").toString
    val ckpt = Files.createTempDirectory("lp_ckpt").toString

    val streams = scala.collection.mutable.Map[String, MemoryStream[Point]]()
    val queries = Pipelines.intervalFanOut(spark, tags,
      mkStream = { groupTags =>
        val ms = MemoryStream[Point]
        streams(groupTags.head.interval) = ms
        ms.toDF()
      },
      outDir = out, checkpointRoot = ckpt)

    // Active intervals in the sample catalog: 1s, 10s, min (60s tags inactive).
    assert(queries.size === 3)
    val t0 = Timestamp.from(Instant.parse("2024-01-01T00:00:00Z"))
    streams.values.foreach(_.addData(
      Point(t0, "plc-1", "temp", 21.5), Point(t0, "plc-2", "count", 3.0)))
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())

    val written = Files.walk(Paths.get(out)).iterator()
    val lpFiles = scala.jdk.CollectionConverters.IteratorHasAsScala(written).asScala
      .filter(_.toString.endsWith(".lp")).toSeq
    assert(lpFiles.nonEmpty)
    val lines = lpFiles.flatMap(f => scala.io.Source.fromFile(f.toFile).getLines())
    assert(lines.exists(_.startsWith("plc-1 temp=21.50 ")))
    assert(lines.exists(_.startsWith("plc-2 count=3.00 ")))
  }
}
