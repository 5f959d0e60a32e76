package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salted two-stage aggregation: correct under skew, and the hot key
  * actually spreads across salt partials (the property that removes the
  * single-reducer bottleneck at 100 TB).
  */
class SkewSpec extends SparkTestBase {

  test("saltedAvg == direct avg on a skewed key distribution") {
    import spark.implicits._
    // key 7 carries 50k rows; keys 0-6 carry 10 each.
    val skewed = (
      (1 to 50000).map(i => (7L, i.toDouble)) ++
      (0 until 7).flatMap(k => (1 to 10).map(i => (k.toLong, (k * 100 + i).toDouble)))
    ).toDF("k", "v").repartition(8)

    val direct = skewed.groupBy("k").agg(avg("v").as("avg_v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedAvg(skewed, "k", "v", salts = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - direct(k)) < 1e-9, s"key $k: $v vs ${direct(k)}")
    }
  }

  test("the hot key spreads across many salt partials") {
    import spark.implicits._
    val skewed = (1 to 50000).map(i => (7L, i.toDouble)).toDF("k", "v").repartition(8)
    val partials = Skew.saltedPartials(skewed, "k", "v", salts = 16)
      .filter(col("k") === 7).count()
    assert(partials >= 12, s"hot key landed in only $partials of 16 salt buckets")
  }
}
