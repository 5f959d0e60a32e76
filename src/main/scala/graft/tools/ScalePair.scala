package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo-paired scale audit (the r11 sf10 methodology as a reusable tool):
  * run ONE registry key at two SF directories inside the SAME warm JVM
  * (2 runs each, min taken — first run at each scale absorbs codegen) and
  * report the wall ratio next to the data ratio. A key is sublinear when
  * ratio < data ratio; a super-linear bend is a scale bug to fix.
  *
  * Usage: runMain graft.tools.ScalePair <key>[,key...] <dirSmall> <dirBig>
  */
object ScalePair {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.tools.ScalePair <key>[,key...] <dirSmall> <dirBig>")
    val Array(keys, dirA, dirB) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results = keys.split(",").map { key =>
      val q = graft.Registry.byName(key)
      def best(dir: String): Double =
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          q.run(spark, dir).collect()
          (System.nanoTime() - t0) / 1e9
        }.min
      val a = best(dirA)
      val b = best(dirB)
      System.gc()
      f""""$key":{"small_s":$a%.2f,"big_s":$b%.2f,"ratio":${b / a}%.2f}"""
    }
    println(s"""{"metric":"scale_pair","small":"$dirA","big":"$dirB",${results.mkString(",")}}""")
    spark.stop()
  }
}
