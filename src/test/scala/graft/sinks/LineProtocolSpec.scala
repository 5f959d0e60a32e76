package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LineProtocolSpec extends SparkTestBase {

  test("line format: measurement alias=value tsNs; measurement escaping") {
    import spark.implicits._
    val df = Seq(("plc 1,a", "temp", 21.5, 1704067200000000L))
      .toDF("measurement", "alias", "value", "tsu")
    val line = df.select(
      LineProtocol.lineCol(col("measurement"), col("alias"), col("value"),
        col("tsu") * 1000L).as("line"))
      .as[String].head()
    assert(line === "plc\\ 1\\,a temp=21.50 1704067200000000000")
  }

  test("formatPoints shapes a decoded point frame into lines") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")),
      "plc-1", "t0", 1.25)).toDF("ts", "measurement", "alias", "value")
    val line = LineProtocol.formatPoints(df).as[String].head()
    assert(line === "plc-1 t0=1.25 1704067200000000000")
  }
}
