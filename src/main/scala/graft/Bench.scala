package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.Locale

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line (also written to bench_out.json, VERDICT.md round-1).
  *
  * Noise handling: this container shows CPU-steal bursts that can inflate a
  * single measurement 10-50x (PERF.md "host noise"), so each query is timed
  * SPARK_GRAFT_BENCH_PASSES times (default 2) and the MINIMUM wall time is
  * reported — the minimum is the structural cost, bursts only ever add.
  *
  * Output size: per-query seconds are rounded to 3 decimals so the whole
  * JSON line stays well inside the driver's bounded stdout-tail capture
  * (BENCH_r02.json recorded "parsed": null because the full-precision line
  * outgrew the tail window and lost its opening brace).
  *
  * Failed queries report -1.0 (not a fake positive wall time).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt.max(1)
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
    val names = SparkEntry.queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map.empty[String, Double]
    var sinceGc = 0
    for (pass <- 1 to passes; name <- names) {
      // ~90 queries generate hundreds of codegen classes; with a 48 GiB
      // heap the JVM may never GC inside one run, so dead generated
      // classloaders are never unloaded and their nmethods saturate the
      // (2g-capped) code cache — the JIT then flush-thrashes and
      // alphabetically-late queries collapse 10-50x. Periodic explicit GC
      // restores the class-unload cadence a long-lived server JVM has
      // naturally. Untimed (outside the measured window).
      sinceGc += 1
      if (sinceGc >= 16) { System.gc(); sinceGc = 0 }
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED (pass $pass): ${e.getMessage}"); false }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // Per-query progress on stderr: makes mid-run JVM degradation (JIT /
      // code-cache collapse shows as monotonically growing times) visible
      // without waiting for the final JSON.
      System.err.println(f"[bench] pass $pass $name%-28s $sec%8.3f s")
      best(name) = best.get(name) match {
        case Some(prev) if prev >= 0 && sec >= 0 => math.min(prev, sec)
        case Some(prev) if prev >= 0             => prev      // keep the success
        case _                                   => sec
      }
    }
    // Code-heap usage at end of run — the collapse diagnostic (PERF.md):
    // "used" at/near "max" on the nmethod heaps means the JIT shut off or
    // started flush-thrashing partway through the run.
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .foreach { p =>
        val u = p.getUsage
        System.err.println(
          s"[bench] ${p.getName}: used=${u.getUsed / 1024 / 1024}m max=${u.getMax / 1024 / 1024}m")
      }
    def r3(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))
    val results = names.map(n => n -> best(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    val json =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failed,"passes":$passes,"sf":"$sfDir"}"""
    println(json)
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
