package graft.queries

import graft.{Registry, SparkTestBase}
import org.apache.spark.sql.functions._

/** r10: the leakage-safe split's guarantee is STRUCTURAL — every member of
  * a near-dup cluster carries the cluster's split, so no near-duplicate
  * pair can straddle train/test. The ratios are the statistical part
  * (hash of the cluster id): loose 80/10/10 bands at test SF.
  */
class SplitLeakageSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("q_split_leakage_safe: no cluster straddles splits; ratios ~80/10/10; total partition") {
    val out = Registry.byName("q_split_leakage_safe").run(spark, dir).cache()
    try {
      val straddlers = out.groupBy("cluster")
        .agg(countDistinct(col("split")).as("k"))
        .filter(col("k") > 1).count()
      assert(straddlers === 0L, "a near-dup cluster straddles train/val/test")
      val n = out.count()
      assert(out.select("doc_id").distinct().count() === n,
        "split must be a partition of the corpus (each doc exactly once)")
      val frac = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
      assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.06, s"train ${frac}")
      assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.04, s"val ${frac}")
      assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.04, s"test ${frac}")
    } finally { out.unpersist(): Unit }
  }
}
