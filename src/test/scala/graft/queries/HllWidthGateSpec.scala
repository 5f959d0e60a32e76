package graft.queries

import graft.SparkTestBase

/** A21 (r12, VERDICT r11 #8): the width-parameterized HLL's measured error
  * stays inside each register count's theoretical band, and widening the
  * sketch buys accuracy on the same data — the gate a deployment reads
  * before picking m from its error budget.
  */
class HllWidthGateSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  private def relErrs(key: String): Seq[Double] =
    graft.Registry.byName(key).run(spark, dir).collect()
      .map(r => r.getDouble(3)).toSeq

  test("measured error within 3 sigma of the 1.04/sqrt(m) band, per width") {
    for ((key, m) <- Seq("q_hll_sketch" -> 64, "q_hll_sketch_w256" -> 256)) {
      val band = 3.0 * 1.04 / math.sqrt(m.toDouble)
      val errs = relErrs(key)
      assert(errs.nonEmpty)
      assert(errs.forall(_ <= band),
        s"$key: rel_err ${errs.max} exceeds the 3-sigma band $band for m=$m")
    }
  }

  test("m=256 is at least as accurate as m=64 on the same corpus") {
    val e64 = relErrs("q_hll_sketch")
    val e256 = relErrs("q_hll_sketch_w256")
    assert(e256.sum / e256.size <= e64.sum / e64.size,
      s"mean rel_err m=256 (${e256.sum / e256.size}) vs m=64 (${e64.sum / e64.size})")
  }
}
