package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: the driver's t1 check — SparkEntry.entry rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)
    println("QUERIES=" + SparkEntry.queries.size + " ORACLES=" + SparkEntry.oracleSql.size)

    // Streaming smoke: DSv2 s7sim source → DecodeS7 → memory sink.
    val q = graft.streaming.Pipelines
      .s7DecodedStream(spark, Seq("10.0.0.1", "10.0.0.2"), tagsPerPlc = 4)
      .writeStream.format("memory").queryName("smoke_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("STREAM_ROWS=" + spark.table("smoke_stream").count())
    spark.table("smoke_stream").show(4, truncate = false)
    spark.stop()
  }
}
