package graft.queries

import graft.{Registry, SparkTestBase}

/** The 100 TB connected-components path: clusterGroups picks driver
  * union-find only while the candidate-pair count fits the injectable
  * `graft.dedup.driverCcMaxPairs` cutoff; past it, distributed min-label
  * propagation takes over. Until round 7 the distributed branch had never
  * executed under a spec (the cutoff was a hard-coded 1M literal) — this
  * pins both branches to identical output on the same input.
  */
class DistributedCcSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val Prop = "graft.dedup.driverCcMaxPairs"

  private def groups(): Seq[(Long, Long)] =
    Registry.byName("q_dedup_groups").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("distributed min-label propagation equals driver union-find") {
    val viaUnionFind = groups() // default cutoff: pairs fit, driver branch
    assert(viaUnionFind.nonEmpty, "fixture has no near-dup clusters to compare")
    System.setProperty(Prop, "0") // force every pair count over the cutoff
    val viaPropagation =
      try groups()
      finally System.clearProperty(Prop)
    assert(viaPropagation == viaUnionFind)
    // sanity on the invariants both branches must hold: canonical label is
    // the component minimum, so every cluster id is itself a member doc
    val members = viaUnionFind.map(_._1).toSet
    assert(viaUnionFind.forall { case (doc, cluster) => cluster <= doc })
    assert(viaUnionFind.map(_._2).forall(members.contains))
  }
}
