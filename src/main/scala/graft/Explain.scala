package graft

import org.apache.spark.sql.SparkSession

/** Plan/timing inspector: `runMain graft.Explain <query> [sfDir] [runs]` —
  * times the query in-JVM (warm runs expose structural cost vs first-run
  * codegen latency, PERF.md "host noise") and prints the executed plan.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val q = Registry.byName(args(0))
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = q.run(spark, dir).count()
      println(f"RUN$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = q.run(spark, dir)
    df.count() // populate the final adaptive plan
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
