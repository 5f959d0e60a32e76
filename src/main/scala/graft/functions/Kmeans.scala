package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared deterministic k-means trainer over int8-quantized vectors —
  * used by the QVector query family (whose DuckDB oracle mirrors every
  * step bit-for-bit) and by [[graft.sinks.VectorIndexStore]] (the store
  * lifecycle artifact, r10).
  *
  * Discipline (established in QVector, kept here verbatim):
  *  - vectors are int8-quantized (`quantExpr`): |q| ≤ 127 keeps every
  *    squared distance ≤ 254²·64 ≈ 4.1e6 ≪ 2⁵³, so all arithmetic is
  *    exact integer math in ANY engine;
  *  - assignment is a codegen'd projection against LITERAL centroids
  *    (zero joins, zero shuffles — the MLlib broadcast pattern);
  *  - the Lloyd update is one k×d hash aggregate; only k×d longs ever
  *    reach the driver;
  *  - seeding is greedy farthest-point (deterministic kmeans++ twin):
  *    seed 0 = min-vec_id row, each next seed maximizes min-distance to
  *    the chosen set, ties to the lowest vec_id. k−1 bounded passes.
  *
  * Input frames carry (vec_id LONG, qv ARRAY<LONG>).
  */
object Kmeans {

  /** Int8 scalar quantization of a float vector column (floor(x·127+0.5)
    * after clamping to [−1,1] — floor keeps engines' rounding identical). */
  def quantExpr(c: String): String =
    s"transform($c, x -> floor(greatest(least(cast(x AS double), 1.0D), -1.0D) * 127.0D + 0.5D))"

  /** Squared-L2 between the quantized column and a literal centroid. */
  def d2Lit(qcol: String, cent: Seq[Long]): Column =
    expr(s"vec_l2sq($qcol, array(${cent.map(v => s"${v}L").mkString(",")}))")

  /** argmin over the k centroids as a (d2, cid) struct — ties to the
    * lowest cluster id via lexicographic array_min. */
  def assignCol(qcol: String, cents: Seq[(Int, Seq[Long])]): Column =
    array_min(array(cents.map { case (cid, cv) =>
      struct(d2Lit(qcol, cv).as("d2"), lit(cid).as("cid")) }: _*))

  /** Greedy farthest-point seeds over a materialized (vec_id, qv) frame. */
  def farthestSeeds(qdf: DataFrame, k: Int): Seq[(Int, Seq[Long])] = {
    val v0 = qdf.agg(min(col("vec_id"))).head().getLong(0)
    var seeds: Vector[(Int, Seq[Long])] = Vector(
      0 -> qdf.filter(col("vec_id") === v0).select("qv").head().getSeq[Long](0).toVector)
    for (j <- 1 until k) {
      val dists = seeds.map { case (_, cv) => d2Lit("qv", cv) }
      val dmin = if (dists.size == 1) dists.head else least(dists: _*)
      val pick = qdf.withColumn("__dmin", dmin)
        .orderBy(col("__dmin").desc, col("vec_id").asc)
        .select("qv").head().getSeq[Long](0).toVector
      seeds :+= (j -> (pick: Seq[Long]))
    }
    seeds
  }

  /** One Lloyd update: assign (projection), per-dim floored integer mean
    * (one k×d aggregate), empty clusters keep their previous centroid. */
  def lloydStep(qdf: DataFrame, cents: Seq[(Int, Seq[Long])]): Seq[(Int, Seq[Long])] = {
    val rows = qdf.withColumn("__a", assignCol("qv", cents))
      .select(col("__a.cid").as("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .collect()
    val byCid = rows.groupBy(_.getInt(0)).map { case (cid, rs) =>
      cid -> (rs.sortBy(_.getInt(1)).map(_.getLong(2)).toVector: Seq[Long])
    }
    cents.map { case (cid, old) => cid -> byCid.getOrElse(cid, old) }
  }

  /** Full training run: (seed centroids, trained centroids). */
  def train(qdf: DataFrame, k: Int, iters: Int): (Seq[(Int, Seq[Long])], Seq[(Int, Seq[Long])]) = {
    val seeds = farthestSeeds(qdf, k)
    var c = seeds
    for (_ <- 1 to iters) c = lloydStep(qdf, c)
    (seeds, c)
  }
}
