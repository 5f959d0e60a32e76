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

  test("AQE skew-join splits the hot key's partition at runtime (JOIN-side story)") {
    // Salting (above) is the fix for skewed AGGREGATIONS; for skewed JOINS
    // the engine lets AQE re-plan at runtime instead: with skewJoin enabled,
    // a post-shuffle partition exceeding factor×median is split into
    // advisory-sized slices and the matching build side is replicated —
    // no salting of join keys needed. Thresholds are lowered here so the
    // ~MB-scale test dataset trips the same machinery a 100 TB hot series
    // key would.
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // key 0 dominates the fact side with a fat payload; dim side uniform.
      val fact = ((1 to 60000).map(i => (0L, "x" * 64 + i)) ++
        (1L to 50L).flatMap(k => (1 to 50).map(i => (k, s"r$i")))).toDF("k", "payload")
        .repartition(8)
      val dim = (0L to 50L).map(k => (k, s"d$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      // collect() (not count()) so the SAME QueryExecution instance runs
      // to completion — count() plans a separate aggregate query and the
      // join's own adaptive plan would stay unexecuted (isFinalPlan=false).
      assert(joined.collect().length === 60000 + 50 * 50)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"expected a final adaptive plan:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"AQE must mark the skew-split join/read in the final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
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
