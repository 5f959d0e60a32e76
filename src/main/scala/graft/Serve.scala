package graft

import org.apache.spark.sql.SparkSession

/** Runnable HTTP front door — the deployment shape of the reference's
  * InfluxDB 1.7 node (ref README.md:13-14): one process serving `/query`,
  * `/write`, and `/ping` over a measurement+date-partitioned point store.
  * A Grafana InfluxDB datasource pointed at this port works unchanged, and
  * the reference's daemons could POST their line protocol here verbatim.
  *
  * {{{
  *   sbt "runMain graft.Serve /path/to/store [port]"   # default 8086
  * }}}
  *
  * The store may start empty (a `/write` creates the first measurement);
  * `/query` re-resolves the catalog per request. On a cluster the same
  * object runs on the driver with `master` set by spark-submit.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val storeDir = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: graft.Serve <storeDir> [port]"))
    val port = args.lift(1).map(_.toInt).getOrElse(8086)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(storeDir))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val handle = graft.influxql.InfluxQLHttp.startStore(spark, storeDir, port)
    println(s"SERVING port=${handle.port} store=$storeDir")
    // serve until killed; the JDK server runs on its own threads
    Thread.currentThread().join()
  }
}
