package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. Also written to bench_out.json so the driver can
  * parse the result even if a logger prefixes stdout (VERDICT.md round-1).
  * Failed queries report -1.0 (not a fake positive wall time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JIT/codegen warmup: one representative query per family so
    // the timed loop measures steady-state throughput, not first-query
    // compiler latency.
    Seq("q_downsample_1m", "q_minhash_sig", "q_lsh_bucket", "q_join_broadcast",
        "q_addr_parse", "q_win_derivative", "q_text_tokens", "q_knn_ivf")
      .foreach(n => try SparkEntry.queries(n)(spark, sfDir).count()
               catch { case _: Throwable => () })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
