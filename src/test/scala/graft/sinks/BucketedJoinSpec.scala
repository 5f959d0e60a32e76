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
    // A previous JVM's managed-table dirs survive under spark-warehouse/
    // while the fresh in-memory catalog has no entry for them — clear both
    // sides so saveAsTable doesn't hit LOCATION_ALREADY_EXISTS.
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      if (loc.exists()) rm(loc)
    }
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
