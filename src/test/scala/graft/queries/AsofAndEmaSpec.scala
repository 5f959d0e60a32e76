package graft.queries

import graft.SparkTestBase
import graft.functions.{Ema, EmaAggregator}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the two order-sensitive custom pieces:
  * the union-window as-of join (SURVEY §7.4 hard part) and the EMA
  * Aggregator (D4).
  */
class AsofAndEmaSpec extends SparkTestBase {

  test("as-of join: last reference value at or before each probe ts, per key") {
    import spark.implicits._
    // key, ts, value, is_probe
    val refs = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 5L, 50.0)).toDF("k", "t", "v")
      .withColumn("is_probe", lit(0))
    val probes = Seq((1L, 9L), (1L, 10L), (1L, 25L), (2L, 4L), (3L, 7L)).toDF("k", "t")
      .withColumn("v", lit(null).cast("double")).withColumn("is_probe", lit(1))
    val w = Window.partitionBy("k").orderBy(col("t"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = probes.unionByName(refs)
      .withColumn("asof", last(when(col("is_probe") === 0, col("v")), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select("k", "t", "asof")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(2)) null else r.getDouble(2)))
      .toMap
    assert(out((1L, 9L)) == null)          // before first ref
    assert(out((1L, 10L)) === 100.0)       // tie: ref at equal ts visible (>=)
    assert(out((1L, 25L)) === 200.0)       // latest ref wins
    assert(out((2L, 4L)) == null)
    assert(out((3L, 7L)) == null)          // key with no refs
  }

  test("EMA aggregator: event-time fold, alpha=0.5, unordered input") {
    import spark.implicits._
    // values arrive out of order; event-time order is 2.0, 4.0, 8.0
    // ema = 2.0 → 0.5*4+0.5*2 = 3.0 → 0.5*8+0.5*3 = 5.5
    val ds = Seq((1L, 30L, 3L, 8.0), (1L, 10L, 1L, 2.0), (1L, 20L, 2L, 4.0), (2L, 1L, 4L, 7.0))
      .toDS() // (key, tsMicros, uniqueId, value)
    val out = ds.groupByKey(_._1).agg(new EmaAggregator(0.5).toColumn.name("ema"))
      .collect().toMap
    assert(out(1L) === 5.5)
    assert(out(2L) === 7.0)
  }

  test("EMA aggregator: equal timestamps fold in unique-id order (deterministic on ties)") {
    import spark.implicits._
    // all three rows share ts=10; id order 1,2,3 → fold 2.0, 4.0, 8.0 → 5.5
    val ds = Seq((1L, 10L, 3L, 8.0), (1L, 10L, 1L, 2.0), (1L, 10L, 2L, 4.0)).toDS()
    val out = ds.repartition(8).groupByKey(_._1)
      .agg(new EmaAggregator(0.5).toColumn.name("ema")).collect().toMap
    assert(out(1L) === 5.5)
  }

  test("Holt scale path (streaming fold) matches the closed array-fold form") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 13 series of mixed lengths incl. n=1 and n=2 edge cases; duplicate
    // timestamps broken by the unique id, as in the registered query.
    val rows = Seq.tabulate(1500)(i =>
      ((i % 13).toLong, ((i * 991) % 5000).toLong, i.toLong, rnd.nextDouble() * 200)) ++
      Seq((100L, 1L, 9001L, 42.5), (101L, 1L, 9002L, 7.0), (101L, 2L, 9003L, 9.0))
    val df = rows.toDF("k", "t", "i", "v")
    // The pre-r5 registered implementation: collect_list array + HOF fold
    // (kept here as the equality pin; the oracle twin is the DuckDB
    // recursive CTE the driver checks at sf0.01).
    val viaArray = df.groupBy("k")
      .agg(expr("transform(array_sort(collect_list(struct(t, i, v))), e -> e.v)").as("vals"))
      .selectExpr("k", "size(vals) AS n", "element_at(vals, 1) AS v1",
        """aggregate(slice(vals, 3, greatest(size(vals) - 2, 0)),
          |  named_struct('l', try_element_at(vals, 2), 'b', try_element_at(vals, 2) - element_at(vals, 1)),
          |  (acc, v) -> named_struct('l', 0.5 * v + 0.5 * (acc.l + acc.b),
          |              'b', 0.3 * ((0.5 * v + 0.5 * (acc.l + acc.b)) - acc.l) + 0.7 * acc.b)) AS st""".stripMargin)
      .selectExpr("k", "n", "CASE WHEN n = 1 THEN v1 ELSE floor((st.l + st.b) * 10000) / 10000 END AS fc")
      .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getDouble(2))).toMap
    val viaScale = graft.functions.Holt.holtByKey(df, 0.5, 0.3)
      .collect().map { case (k, n, fc) => k -> (n, fc) }.toMap
    assert(viaScale === viaArray)
  }

  test("EMA scale path (sortWithinPartitions + streaming fold) matches the Aggregator") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // duplicate timestamps across keys; the unique id column breaks ties
    // identically in both paths.
    val rows = Seq.tabulate(2000)(i =>
      ((i % 13).toLong, ((i * 997) % 20000).toLong, i.toLong, rnd.nextDouble() * 100))
    val ds = rows.toDS()
    val viaAgg = ds.groupByKey(_._1).agg(new EmaAggregator(0.3).toColumn.name("ema"))
      .collect().toMap
    val viaScale = Ema.emaByKey(ds, 0.3).collect().toMap
    assert(viaScale.keySet === viaAgg.keySet)
    viaScale.foreach { case (k, v) => assert(math.abs(v - viaAgg(k)) < 1e-9, s"key $k") }
  }
}
