package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

/** S4 db-per-PLC layout + S5 dead-letter split. */
class PointStoreSpec extends SparkTestBase {

  test("writePartitioned lays out one directory per measurement per day (db-per-PLC)") {
    import spark.implicits._
    val t0 = Timestamp.from(Instant.parse("2024-01-01T10:00:00Z"))
    val t1 = Timestamp.from(Instant.parse("2024-01-02T10:00:00Z"))
    val pts = Seq(
      (t0, "plc-1", "temp", 1.0), (t0, "plc-2", "temp", 2.0), (t1, "plc-1", "temp", 3.0))
      .toDF("ts", "measurement", "alias", "value")
    val dir = Files.createTempDirectory("points").toString
    PointStore.writePartitioned(pts, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("measurement=plc-1", "measurement=plc-2"))
    val days = new java.io.File(s"$dir/measurement=plc-1").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(days === Array("date=2024-01-01", "date=2024-01-02"))
    // partition pruning: a per-PLC read touches only that directory
    val back = spark.read.parquet(dir).filter(col("measurement") === "plc-1")
    assert(back.count() === 2)
  }

  test("splitDeadLetter keeps rejects with an error column instead of dropping them") {
    import spark.implicits._
    val decoded = Seq(("a", Some(1.0)), ("b", None), ("c", Some(3.0)))
      .toDF("alias", "value")
    val (good, dead) = PointStore.splitDeadLetter(decoded)
    assert(good.count() === 2)
    assert(dead.select("alias").as[String].collect().toSeq === Seq("b"))
    assert(dead.columns.contains("error"))
  }
}
