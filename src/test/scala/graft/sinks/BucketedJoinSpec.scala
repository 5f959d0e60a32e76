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

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (loc.exists()) rm(loc)
  }

  test("LSH band table bucketed by (band_id, k): candidate self-join plans no Exchange") {
    dropTable("b_bands")
    val bands = graft.queries.QDedup.bandedSignatures(spark, dir)
    BucketedStore.write(bands, "b_bands", Seq("band_id", "k"), 4)

    // The q_dedup_minhash candidate join, reading the PERSISTED bucketed
    // layout: both sides are the same co-bucketed table, renamed (never
    // .as-aliased — that degrades a self-join to a cartesian).
    def side(prefix: String): org.apache.spark.sql.DataFrame =
      spark.table("b_bands").toDF(
        s"doc_$prefix" +: (0 until 8).map(i => s"${prefix}mh$i") :+
          s"band_$prefix" :+ s"k_$prefix": _*)
    val joined = side("a").hint("merge")
      .join(side("b"),
        col("band_a") === col("band_b") && col("k_a") === col("k_b") &&
          col("doc_a") < col("doc_b"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge:\n$plan")
    assert(!plan.contains("Exchange"), s"co-bucketed self-join must not shuffle:\n$plan")

    // Same candidate pairs as the shuffled in-memory variant.
    val shuffled = {
      val bx = bands.toDF("doc_a" +: (0 until 8).map(i => s"amh$i") :+ "band_a" :+ "k_a": _*)
      val by = bands.toDF("doc_b" +: (0 until 8).map(i => s"bmh$i") :+ "band_b" :+ "k_b": _*)
      bx.join(by,
        col("band_a") === col("band_b") && col("k_a") === col("k_b") &&
          col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
    }
    assert(joined.select("doc_a", "doc_b").distinct().count() === shuffled)
  }

  test("co-bucketed join plans with no Exchange (shuffle-free sort-merge)") {
    // A previous JVM's managed-table dirs survive under spark-warehouse/
    // while the fresh in-memory catalog has no entry for them — clear both
    // sides so saveAsTable doesn't hit LOCATION_ALREADY_EXISTS.
    Seq("b_orders", "b_lineitem").foreach(dropTable)
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
