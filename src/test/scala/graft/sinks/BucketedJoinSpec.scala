package graft.sinks

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Pins the bucketed-layout promise (SURVEY §4): co-bucketed tables join
  * with NO Exchange in the physical plan — the shape that makes hot-path
  * enrichment joins shuffle-free at 100 TB.
  */
class BucketedJoinSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("co-bucketed join plans with no Exchange (shuffle-free sort-merge)") {
    BucketedStore.write(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    BucketedStore.write(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)

    // Force the join OFF the broadcast path (these test tables are tiny;
    // at 100 TB neither side broadcasts) so the plan proves bucket-to-
    // bucket locality rather than a broadcast rescue.
    val joined = spark.table("b_orders")
      .hint("merge")
      .join(spark.table("b_lineitem"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() === Tables.lineitem(spark, dir).count())
  }
}
