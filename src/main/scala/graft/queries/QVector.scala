package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftQuery
import graft.functions.VectorMath
import Q._

/** Similarity search over the embeddings table — SURVEY.md §2.10 D6 + the
  * ANN extensions (brute-force baseline, LSH buckets, IVF scale path,
  * int8 quantization, recall measurement).
  *
  * Scale design (the 100 TB story, per VERDICT.md round-1):
  *  - the probe set is always bounded and BROADCAST — the corpus is never
  *    cross-joined against itself;
  *  - q_lsh_bucket assigns every vector to a random-hyperplane bucket in a
  *    single per-row pass (no shuffle); near-dup candidates are generated
  *    by an equi-join on the bucket key, so the pair count is
  *    sum(bucket²) ≪ n²;
  *  - q_knn_ivf probes only the top-2 coarse cells (labels here stand in
  *    for k-means cells) — the IVF pruning pattern: the fine search scans
  *    1/5th of the corpus instead of all of it;
  *  - q_quantized_dot is the memory-side scale lever: int8 codes are 4×
  *    smaller than float32, so 4× more corpus fits per executor and scan
  *    bandwidth drops 4×; the integer dot is exact (≤ 2^53) and the
  *    rank error vs float cosine is measured per row;
  *  - q_knn_recall closes the loop: ANN quality (recall@5 of IVF against
  *    the brute-force ground truth) computed as a query, the way a 100 TB
  *    index build would validate itself on a sampled probe set.
  *
  * All dot products run in double with identical left-to-right accumulation
  * in Spark (`aggregate` fold) and DuckDB (`list_dot_product`) → exact
  * hash parity.
  */
object QVector {

  /** Deterministic integer hyperplanes: w(h,d) = ((h*37 + d*101) % 19) - 9. */
  private def plane(h: Int): Seq[Long] = (0 until 64).map(d => ((h * 37 + d * 101) % 19).toLong - 9)

  /** Cells probed by the TRAINED-quantizer IVF (see [[kmeansIvfTop]] for
    * the 3 → 4 rationale). Declared before `all`: the oracle fragments
    * interpolate it at object init. */
  private val kmeansNprobe = 4

  /** The probe sweep's range (r11): swept to the FULL probe count — the
    * last point probes every cell, so the curve visibly converges to the
    * brute-force recall 1.0 limit (= KmeansK; declared here because the
    * oracle fragments interpolate it at object init). */
  private val sweepMaxNprobe = 8

  /** Every QVector query reads embeddings through this hook, which also
    * registers the native vec_dot/vec_cos/vec_l2sq expressions (see
    * [[graft.functions.VectorMath]]: same left-to-right double arithmetic
    * as the `aggregate(zip_with(...))` HOFs these helpers previously
    * emitted, but one codegen'd static call per row instead of hundreds of
    * interpreted lambda invocations). */
  private def embeddings(s: SparkSession, dir: String): DataFrame = {
    VectorMath.register(s)
    Q.embeddings(s, dir)
  }

  private def sDot(a: String, b: String) = s"vec_dot($a, $b)"
  private def sCos(a: String, b: String) = s"vec_cos($a, $b)"

  private def dCos(a: String, b: String) =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** Int8 scalar quantization: q(x) = floor(clamp(x,−1,1)·127 + 0.5).
    * floor(x+0.5) (not round) so Spark and DuckDB round identically; the
    * quantized values stay exact in double (|q| ≤ 127, products ≤ 16129,
    * 64-dim sums ≤ ~1e6 ≪ 2^53), so both engines compute bit-identical
    * dots.
    */
  private def sQuant(c: String) = graft.functions.Kmeans.quantExpr(c)
  private def dQuant(c: String) =
    s"list_transform($c::DOUBLE[], x -> floor(greatest(least(x, 1.0), -1.0) * 127.0 + 0.5))"

  /** Spark-side LSH bucket id from 8 hyperplane sign bits. */
  private def sparkBucket(df: DataFrame): DataFrame = {
    val fanned = Q.fanout(df)
    val bits = (0 until 8).map { h =>
      val w = s"array(${plane(h).map(v => s"${v}D").mkString(",")})"
      when(expr(sDot("embedding", w)) > 0, lit(1L << h)).otherwise(lit(0L))
    }
    fanned.withColumn("bucket", bits.reduce(_ + _))
  }

  private val duckBucket = (0 until 8).map { h =>
    val w = s"[${plane(h).mkString(",")}]::DOUBLE[]"
    s"(CASE WHEN list_dot_product(embedding::DOUBLE[], $w) > 0 THEN ${1L << h} ELSE 0 END)"
  }.mkString(" + ")

  // ---- shared ANN builders (used by q_knn_brute / q_knn_ivf / q_knn_recall)

  /** Probe set: bounded, always broadcast. */
  private def probesDF(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  /** Brute-force cosine ranking: (probe_id, neighbor_id, rnk, score_raw). */
  private def bruteTop(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy("probe_id").orderBy(col("score_raw").desc, col("neighbor_id"))
    Q.fanout(embeddings(s, dir)).crossJoin(broadcast(probesDF(s, dir)))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        expr(sCos("embedding", "pe")).as("score_raw"))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
  }

  /** Coarse-cell centroid table — PRECOMPUTED once per (session, dir) and
    * materialized via eager localCheckpoint, the way a 100 TB deployment
    * would persist the trained coarse quantizer as its own table: the
    * element-wise centroid per label is built in ONE corpus pass, then
    * every `q_knn_ivf`/`q_knn_recall` probe reads the (labels × dims)-row
    * checkpoint instead of re-aggregating the corpus. Labels stand in for
    * k-means cells; swap the builder for a trained quantizer, the read
    * path is identical.
    */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def coarseCentroids(s: SparkSession, dir: String): DataFrame =
    centCache.getOrElseUpdate((s, dir),
      embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("label", "pos").agg(avg(col("v").cast("double")).as("cv"))
        .transform(Q.materialize))

  /** IVF-pruned ranking: coarse-quantize probes to top-2 cells, fine-search
    * only those cells. Returns (probe_id, neighbor_id, rnk, score_raw).
    */
  private def ivfTop(s: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, dir)
    val probes = probesDF(s, dir)
    val cent = coarseCentroids(s, dir)
    val pex = probes.select(col("probe_id"), posexplode(col("pe")).as(Seq("pos", "pv")))
      .withColumn("pv", col("pv").cast("double"))
    val pc = pex.join(cent, "pos")
      .groupBy("probe_id", "label")
      .agg((sum(col("pv") * col("cv")) /
        (sqrt(sum(col("pv") * col("pv"))) * sqrt(sum(col("cv") * col("cv"))))).as("cos_pc"))
    val wSel = Window.partitionBy("probe_id").orderBy(col("cos_pc").desc, col("label"))
    val sel = pc.withColumn("rn", row_number().over(wSel)).filter(col("rn") <= 2)
      .select("probe_id", "label")
    val cand = sel.join(Q.fanout(emb), "label")
      .select(col("probe_id"), col("vec_id"), col("embedding").as("ce"))
    val wk = Window.partitionBy("probe_id").orderBy(col("score_raw").desc, col("neighbor_id"))
    cand.join(broadcast(probes), "probe_id")
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        expr(sCos("ce", "pe")).as("score_raw"))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
  }

  // DuckDB twins of the builders, as composable CTE fragments.
  private val dPr =
    "pr AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe FROM embeddings WHERE vec_id < 5)"

  private val dBrute =
    s"""bscored AS (SELECT pr.probe_id, e.vec_id AS neighbor_id,
       |                   ${dCos("e.embedding::DOUBLE[]", "pr.pe")} AS score
       |            FROM embeddings e CROSS JOIN pr WHERE e.vec_id <> pr.probe_id),
       |brute AS (SELECT probe_id, neighbor_id, score,
       |                 row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rnk
       |          FROM bscored)""".stripMargin

  private val dIvf =
    s"""ex AS (SELECT label, unnest(embedding) AS v, unnest(range(1, len(embedding) + 1)) AS pos
       |       FROM embeddings),
       |cent AS (SELECT label, pos, avg(v::DOUBLE) AS cv FROM ex GROUP BY 1, 2),
       |pex AS (SELECT probe_id, unnest(pe) AS pv, unnest(range(1, len(pe) + 1)) AS pos FROM pr),
       |pc AS (SELECT p.probe_id, c.label,
       |              sum(p.pv * c.cv) / (sqrt(sum(p.pv * p.pv)) * sqrt(sum(c.cv * c.cv))) AS cos_pc
       |       FROM pex p JOIN cent c ON c.pos = p.pos GROUP BY 1, 2),
       |sel AS (SELECT probe_id, label FROM pc
       |        QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cos_pc DESC, label) <= 2),
       |cand AS (SELECT s.probe_id, e.vec_id, e.embedding::DOUBLE[] AS ce
       |         FROM sel s JOIN embeddings e ON e.label = s.label),
       |iscored AS (SELECT c.probe_id, c.vec_id AS neighbor_id, ${dCos("c.ce", "pr.pe")} AS score
       |            FROM cand c JOIN pr ON pr.probe_id = c.probe_id
       |            WHERE c.vec_id <> c.probe_id),
       |ivf AS (SELECT probe_id, neighbor_id, score,
       |               row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, neighbor_id) AS rnk
       |        FROM iscored)""".stripMargin

  // ---- k-means clustering (q_cluster_kmeans) ---------------------------

  /** Squared-L2 distance between the int8-quantized row vector `qcol` and a
    * LITERAL centroid — a pure codegen'd projection, so cluster assignment
    * costs zero shuffles and zero joins per iteration. All arithmetic is
    * integer (|q| ≤ 127 ⇒ d2 ≤ 254²·64 ≈ 4.1e6 ≪ 2^53), so Spark and
    * DuckDB agree bit-for-bit.
    */
  private def d2Lit(qcol: String, cent: Seq[Long]): org.apache.spark.sql.Column =
    graft.functions.Kmeans.d2Lit(qcol, cent)

  /** argmin over the k centroids, ties to the lowest cluster id — struct
    * ordering makes array_min the lexicographic (d2, cid) minimum. */
  private def assignCol(qcol: String, cents: Seq[(Int, Seq[Long])]): org.apache.spark.sql.Column =
    graft.functions.Kmeans.assignCol(qcol, cents)

  /** Quantized corpus + both Lloyd-iteration assignments, shared by
    * q_cluster_kmeans and q_dedup_semantic: (vec_id, qv, __a1, __a2)
    * where __a1/__a2 are (d2, cid) structs under the seed / trained
    * centroids. Materialized so the two corpus passes run once.
    */
  private def kmeansAssigned(s: SparkSession, dir: String): DataFrame =
    kmeansModel(s, dir)._1

  /** The trained model: the assigned corpus (vec_id, embedding, qv, __a1,
    * __a2) AND the trained centroids — q_knn_ivf_kmeans reads the centroids
    * as its coarse quantizer (the "swap the stand-in for a trained
    * quantizer" path promised by the IVF design note).
    */
  /** k and Lloyd convergence budget — mirrored EXACTLY in [[dKmeans]]. */
  private val KmeansK = 8
  private val LloydIters = 5

  /** Per-(session, dir) model cache — the same justification as
    * [[centCache]], now LITERALLY implemented as a store artifact by
    * [[graft.sinks.VectorIndexStore]]: a deployment trains the quantizer
    * once and persists it; six registry keys re-deriving identical
    * centroids per query would charge the training loop (k−1 seeding
    * passes + 5 Lloyd aggregates) six times per board run.
    */
  private val modelCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, Seq[(Int, Seq[Long])])]

  private def kmeansModel(s: SparkSession, dir: String): (DataFrame, Seq[(Int, Seq[Long])]) =
    modelCache.getOrElseUpdate((s, dir), trainKmeansModel(s, dir))

  private def trainKmeansModel(s: SparkSession, dir: String): (DataFrame, Seq[(Int, Seq[Long])]) = {
    val qdf = Q.materialize(Q.fanout(embeddings(s, dir))
      .select(col("vec_id"), col("embedding"), expr(sQuant("embedding")).as("qv")))
    // Training lives in graft.functions.Kmeans (r10 — shared with the
    // VectorIndexStore lifecycle artifact): farthest-point seeding (the
    // deterministic kmeans++ twin; r8-r9 seeded with literally the first
    // 8 corpus rows) + a fixed [[LloydIters]] Lloyd budget (a fixed count
    // rather than a movement epsilon keeps the oracle twin a finite CTE
    // chain). Integer d2 throughout → DuckDB retraces every step.
    val (seeds, c) = graft.functions.Kmeans.train(qdf, KmeansK, LloydIters)
    (qdf.withColumn("__a1", assignCol("qv", seeds))
       .withColumn("__a2", assignCol("qv", c)), c)
  }

  /** Integer squared-L2 between two BIGINT[] lists in DuckDB. */
  private def dD2(a: String, b: String): String =
    s"""CAST(list_dot_product($a::DOUBLE[], $a::DOUBLE[])
       | - 2 * list_dot_product($a::DOUBLE[], $b::DOUBLE[])
       | + list_dot_product($b::DOUBLE[], $b::DOUBLE[]) AS BIGINT)""".stripMargin

  /** DuckDB twin of [[kmeansModel]] as a shared CTE prefix, GENERATED to
    * mirror the training loop exactly: quantized corpus `q`; farthest-point
    * seeds `kseed0..kseed{k-1}` (each step picks argmax min-distance, ties
    * to the lowest vec_id); seed centroids `c0`; [[LloydIters]] Lloyd
    * blocks `kd/ka/ks/kn/kc{t}` (assign → per-dim floored mean → empty
    * clusters keep the previous centroid); exposes `a1(vec_id, qv, cl1,
    * d2)` = the seed assignment, `cf(cid, cv)` = trained centroids, and
    * `a2(vec_id, qv, cluster, d2)` = the final assignment.
    */
  private val dKmeans: String = {
    val sb = new StringBuilder
    sb ++= s"""q AS MATERIALIZED (SELECT vec_id, ${dQuant("embedding")}
              |                  ::BIGINT[] AS qv
              |           FROM embeddings),
              |kseed0 AS MATERIALIZED (SELECT 0 AS cid, vec_id, qv AS cv FROM q
              |           WHERE vec_id = (SELECT min(vec_id) FROM q)),
              |""".stripMargin
    for (j <- 1 until KmeansK) {
      sb ++= s"""kcand$j AS MATERIALIZED (SELECT q.vec_id, q.qv, min(${dD2("q.qv", "s.cv")}) AS dmin
                |            FROM q CROSS JOIN kseed${j - 1} s GROUP BY q.vec_id, q.qv),
                |kpick$j AS MATERIALIZED (SELECT $j AS cid, vec_id, qv AS cv FROM kcand$j
                |            ORDER BY dmin DESC, vec_id LIMIT 1),
                |kseed$j AS MATERIALIZED (SELECT * FROM kseed${j - 1} UNION ALL SELECT * FROM kpick$j),
                |""".stripMargin
    }
    sb ++= s"c0 AS MATERIALIZED (SELECT cid, cv FROM kseed${KmeansK - 1}),\n"
    for (t <- 1 to LloydIters) {
      val prev = if (t == 1) "c0" else s"kc${t - 1}"
      sb ++= s"""kd$t AS MATERIALIZED (SELECT q.vec_id, q.qv, c.cid, ${dD2("q.qv", "c.cv")} AS d2
                |        FROM q CROSS JOIN $prev c),
                |ka$t AS MATERIALIZED (SELECT vec_id, qv, cid, d2 FROM kd$t
                |        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1),
                |ks$t AS MATERIALIZED (SELECT ka$t.cid, t.i,
                |              CAST(floor(sum(ka$t.qv[t.i])::DOUBLE / count(*)) AS BIGINT) AS cv_i
                |        FROM ka$t CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
                |kn$t AS MATERIALIZED (SELECT cid, list(cv_i ORDER BY i) AS cv FROM ks$t GROUP BY cid),
                |kc$t AS MATERIALIZED (SELECT p.cid, coalesce(kn$t.cv, p.cv) AS cv
                |        FROM $prev p LEFT JOIN kn$t USING (cid)),
                |""".stripMargin
    }
    sb ++= s"""a1 AS MATERIALIZED (SELECT vec_id, qv, cid AS cl1, d2 FROM ka1),
              |cf AS MATERIALIZED (SELECT cid, cv FROM kc$LloydIters),
              |fd AS MATERIALIZED (SELECT q.vec_id, q.qv, c.cid, ${dD2("q.qv", "c.cv")} AS d2
              |       FROM q CROSS JOIN cf c),
              |a2 AS MATERIALIZED (SELECT vec_id, qv, cid AS cluster, d2 FROM fd
              |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1)""".stripMargin
    sb.toString
  }

  val all: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_array_dot",
      "F10/D6: dot product + cosine vs a fixed probe vector (higher-order array fns, no UDF)",
      s"""WITH p AS (SELECT embedding::DOUBLE[] AS probe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |       round(list_dot_product(e.embedding::DOUBLE[], p.probe), 4) + 0 AS dot,
         |       round(${dCos("e.embedding::DOUBLE[]", "p.probe")}, 4) + 0 AS cos
         |FROM embeddings e, p ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = embeddings(s, dir)
      val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
      Q.fanout(emb).crossJoin(broadcast(probe))
        .select(col("vec_id"),
          (round(expr(sDot("embedding", "probe")), 4) + lit(0.0)).as("dot"),
          (round(expr(sCos("embedding", "probe")), 4) + lit(0.0)).as("cos"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_quantized_dot",
      "Extension: int8 scalar-quantized cosine (4x memory/scan reduction) + per-row rank error vs float",
      s"""WITH p AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |q AS (SELECT e.vec_id,
         |             ${dCos("e.embedding::DOUBLE[]", "p.embedding::DOUBLE[]")} AS cos_f,
         |             ${dCos(dQuant("e.embedding"), dQuant("p.embedding"))} AS cos_q
         |      FROM embeddings e, p)
         |SELECT vec_id, round(cos_f, 4) + 0 AS cos_float, round(cos_q, 4) + 0 AS cos_int8,
         |       round(abs(cos_q - cos_f), 4) + 0 AS abs_err
         |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val emb = embeddings(s, dir)
      val probe = emb.filter(col("vec_id") === 0).select(col("embedding").as("probe"))
      Q.fanout(emb).crossJoin(broadcast(probe))
        .select(col("vec_id"),
          expr(sCos("embedding", "probe")).as("cos_f"),
          expr(sCos(sQuant("embedding"), sQuant("probe"))).as("cos_q"))
        .select(col("vec_id"),
          (round(col("cos_f"), 4) + lit(0.0)).as("cos_float"),
          (round(col("cos_q"), 4) + lit(0.0)).as("cos_int8"),
          (round(abs(col("cos_q") - col("cos_f")), 4) + lit(0.0)).as("abs_err"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_lsh_bucket",
      "Extension: random-hyperplane LSH bucket per vector (single per-row pass, shuffle-free)",
      s"""SELECT vec_id, CAST($duckBucket AS BIGINT) AS bucket,
         |       count(*) OVER (PARTITION BY CAST($duckBucket AS BIGINT)) AS n_bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      sparkBucket(embeddings(s, dir))
        .withColumn("n_bucket", count(lit(1)).over(Window.partitionBy("bucket")))
        .select("vec_id", "bucket", "n_bucket")
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_dedup_embedding",
      "Extension: embedding near-dup candidates — bucket equi-join + exact cosine ≥ 0.2 (not all-pairs)",
      s"""WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e, CAST($duckBucket AS BIGINT) AS bucket
         |           FROM embeddings)
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, round(${dCos("x.e", "y.e")}, 4) AS cos
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${dCos("x.e", "y.e")} >= 0.2
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      val b = sparkBucket(embeddings(s, dir)).select("vec_id", "embedding", "bucket")
        .transform(Q.materialize)  // bucket reused on both join sides
      val x = b.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("bucket"))
      val y = b.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("bucket").as("bucket_b"))
      x.join(y, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
        .withColumn("cos_raw", expr(sCos("ea", "eb")))
        .filter(col("cos_raw") >= 0.2)
        .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos"))
        .orderBy("vec_a", "vec_b")
    },

    GraftQuery(
      "q_knn_brute",
      "D6: brute-force cosine top-k — bounded probe set broadcast against the corpus",
      s"""WITH $dPr,
         |$dBrute
         |SELECT probe_id, neighbor_id, rnk, round(score, 4) AS score
         |FROM brute WHERE rnk <= 10 ORDER BY probe_id, rnk""".stripMargin) { (s, dir) =>
      bruteTop(s, dir, 10)
        .select(col("probe_id"), col("neighbor_id"), col("rnk").cast("bigint").as("rnk"),
          round(col("score_raw"), 4).as("score"))
        .orderBy("probe_id", "rnk")
    },

    GraftQuery(
      "q_knn_ivf",
      "Extension: IVF-pruned ANN — coarse quantize to top-2 cells, fine-search only those cells",
      s"""WITH $dPr,
         |$dIvf
         |SELECT probe_id, neighbor_id, rnk, round(score, 4) AS score
         |FROM ivf WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin) { (s, dir) =>
      ivfTop(s, dir, 5)
        .select(col("probe_id"), col("neighbor_id"), col("rnk").cast("bigint").as("rnk"),
          round(col("score_raw"), 4).as("score"))
        .orderBy("probe_id", "rnk")
    },

    GraftQuery(
      "q_knn_recall",
      "Extension: ANN quality gate — recall@5 of the IVF index vs brute-force ground truth, per probe",
      s"""WITH $dPr,
         |$dBrute,
         |$dIvf
         |SELECT b.probe_id, count(i.neighbor_id) / 5.0 AS recall5
         |FROM (SELECT probe_id, neighbor_id FROM brute WHERE rnk <= 5) b
         |LEFT JOIN (SELECT probe_id, neighbor_id FROM ivf WHERE rnk <= 5) i
         |       ON b.probe_id = i.probe_id AND b.neighbor_id = i.neighbor_id
         |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin) { (s, dir) =>
      val b = bruteTop(s, dir, 5).select("probe_id", "neighbor_id")
      val i = ivfTop(s, dir, 5)
        .select(col("probe_id").as("i_probe"), col("neighbor_id").as("i_neighbor"))
      b.join(i, col("probe_id") === col("i_probe") && col("neighbor_id") === col("i_neighbor"),
          "left")
        .groupBy("probe_id")
        .agg((count(col("i_neighbor")) / lit(5.0)).as("recall5"))
        .orderBy("probe_id")
    },

    GraftQuery(
      "q_cluster_kmeans",
      "Extension: k-means embedding clustering (k=8, farthest-point seeding + 5 Lloyd iterations) over int8-quantized " +
        "vectors — assignment is a ZERO-shuffle codegen'd projection (centroids are broadcast " +
        "literals, the MLlib pattern); the update is one kxd aggregate and only kxd longs ever " +
        "reach the driver. Integer arithmetic end to end -> bit-exact DuckDB parity",
      s"""WITH $dKmeans
         |SELECT a2.vec_id, a1.cl1::BIGINT AS cluster_init, a2.cluster::BIGINT AS cluster, a2.d2
         |FROM a2 JOIN a1 ON a1.vec_id = a2.vec_id ORDER BY a2.vec_id""".stripMargin) { (s, dir) =>
      kmeansAssigned(s, dir)
        .select(col("vec_id"),
          col("__a1.cid").cast("bigint").as("cluster_init"),
          col("__a2.cid").cast("bigint").as("cluster"),
          col("__a2.d2").as("d2"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_dedup_semantic",
      "Extension: SemDeDup-style semantic dedup — k-means clusters bound the pair fan-out " +
        "(sum of cluster² ≪ n², the reason SemDeDup clusters first), then exact quantized " +
        "cosine ≥ 0.35 inside each cluster; a vector drops when a lower-id near-dup exists " +
        "in its cluster (the greedy keep-first rule). Integer dots → deterministic threshold",
      s"""WITH $dKmeans,
         |pairs AS (SELECT b.vec_id AS dup_id
         |          FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |          WHERE list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[])
         |                  / (sqrt(list_dot_product(a.qv::DOUBLE[], a.qv::DOUBLE[]))
         |                     * sqrt(list_dot_product(b.qv::DOUBLE[], b.qv::DOUBLE[]))) >= 0.35)
         |SELECT a2.vec_id, a2.cluster::BIGINT AS cluster,
         |       CAST(count(p.dup_id) AS BIGINT) AS n_nearer_dups,
         |       count(p.dup_id) > 0 AS dropped
         |FROM a2 LEFT JOIN pairs p ON p.dup_id = a2.vec_id
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, dir) =>
      val assigned = Q.materialize(kmeansAssigned(s, dir)
        .select(col("vec_id"), col("qv"), col("__a2.cid").as("cluster")))
      // renamed-toDF frames, NOT aliased self-joins (PERF.md r2 #3: alias
      // dedup degrades the equi-join to a cartesian)
      val a = assigned.toDF("keep_id", "qa", "cluster")
      val b = assigned.toDF("dup_id", "qb", "cluster_b")
      val dups = a.join(b,
          col("cluster") === col("cluster_b") && col("keep_id") < col("dup_id"))
        .filter(expr(s"${sDot("qa", "qb")} / (sqrt(${sDot("qa", "qa")})" +
          s" * sqrt(${sDot("qb", "qb")}))") >= 0.35)
        .groupBy(col("dup_id")).agg(count(lit(1)).as("n"))
      assigned.join(dups, assigned("vec_id") === dups("dup_id"), "left")
        .select(col("vec_id"), col("cluster").cast("bigint").as("cluster"),
          coalesce(col("n"), lit(0L)).as("n_nearer_dups"),
          (coalesce(col("n"), lit(0L)) > 0).as("dropped"))
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_kmeans_inertia",
      "Extension: k-means fit diagnostics — per-cluster population and inertia (sum of " +
        "squared distances), the elbow-method numbers a clustering run reports. One " +
        "k-row aggregate over the shared assignment (integer d2 → exact sums)",
      s"""WITH $dKmeans
         |SELECT a2.cluster::BIGINT AS cluster, count(*) AS n, sum(a2.d2)::BIGINT AS inertia
         |FROM a2 GROUP BY 1 ORDER BY cluster""".stripMargin) { (s, dir) =>
      kmeansAssigned(s, dir)
        .groupBy(col("__a2.cid").cast("bigint").as("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("__a2.d2")).as("inertia"))
        .orderBy("cluster")
    },

    GraftQuery(
      "q_cluster_purity",
      "Extension: clustering-quality diagnostic — per-cluster label purity against the " +
        "corpus ground-truth labels (majority-label fraction; the number an unsupervised " +
        "run reports when labels exist to audit against). One join to the label column + " +
        "two k-row aggregates over the shared assignment",
      s"""WITH $dKmeans,
         |j AS (SELECT a2.vec_id, a2.cluster, e.label FROM a2
         |      JOIN embeddings e ON e.vec_id = a2.vec_id),
         |c AS (SELECT cluster, label, count(*) AS n FROM j GROUP BY 1, 2),
         |t AS (SELECT cluster, label, n,
         |             sum(n) OVER (PARTITION BY cluster) AS total,
         |             row_number() OVER (PARTITION BY cluster
         |                                ORDER BY n DESC, label) AS rnk
         |      FROM c)
         |SELECT cluster::BIGINT AS cluster, CAST(total AS BIGINT) AS n,
         |       label::BIGINT AS top_label, round(n::DOUBLE / total, 4) AS purity
         |FROM t WHERE rnk = 1 ORDER BY cluster""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val a = kmeansAssigned(s, dir)
        .select(col("vec_id"), col("__a2.cid").as("cluster"))
      val lbl = embeddings(s, dir).select(col("vec_id").as("lv"), col("label"))
      val c = a.join(lbl, col("vec_id") === col("lv"))
        .groupBy("cluster", "label").agg(count(lit(1)).as("n"))
      val wc = Window.partitionBy("cluster")
      val wr = Window.partitionBy("cluster").orderBy(col("n").desc, col("label"))
      c.withColumn("total", sum(col("n")).over(wc))
        .withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") === 1)
        .select(col("cluster").cast("bigint").as("cluster"), col("total").as("n"),
          col("label").cast("bigint").as("top_label"),
          round(col("n").cast("double") / col("total"), 4).as("purity"))
        .orderBy("cluster")
    },

    GraftQuery(
      "q_embedding_outliers",
      "Extension (r10): embedding OUTLIER report — the 3 farthest members of every " +
        "k-means cluster by z-scored distance-to-centroid, the mislabeled/anomalous-" +
        "vector shortlist a data-quality pass reviews before the corpus trains or " +
        "indexes. Inputs stay exact integers (d2, Σd2, Σd2² are exact long sums), " +
        "so the z expression is one fixed double op-sequence both engines evaluate " +
        "bit-identically; the per-cluster top-3 cut ranks by INTEGER d2 (z is " +
        "monotone in d2 within a cluster), so no FP boundary picks the rows.",
      s"""WITH $dKmeans,
         |st AS (SELECT cluster, count(*) AS n,
         |              sum(d2)::BIGINT AS ssum, sum(d2*d2)::BIGINT AS ssq
         |       FROM a2 GROUP BY cluster),
         |z AS (SELECT a2.vec_id, a2.cluster, a2.d2,
         |             (a2.d2 - st.ssum::DOUBLE / st.n)
         |               / sqrt(st.ssq::DOUBLE / st.n
         |                      - (st.ssum::DOUBLE / st.n) * (st.ssum::DOUBLE / st.n))
         |               AS zv
         |      FROM a2 JOIN st USING (cluster)
         |      WHERE st.ssq::DOUBLE / st.n
         |            - (st.ssum::DOUBLE / st.n) * (st.ssum::DOUBLE / st.n) > 0)
         |SELECT cluster::BIGINT AS cluster, vec_id, d2::BIGINT AS d2,
         |       round(zv, 4) + 0 AS zscore
         |FROM z
         |QUALIFY row_number() OVER (PARTITION BY cluster ORDER BY d2 DESC, vec_id) <= 3
         |ORDER BY cluster, d2 DESC, vec_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val a2 = kmeansAssigned(s, dir)
        .select(col("vec_id"), col("__a2.cid").as("cluster"), col("__a2.d2").as("d2"))
      val st = a2.groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum(col("d2")).as("ssum"),
          sum(col("d2") * col("d2")).as("ssq"))
      val mean = col("ssum").cast("double") / col("n")
      val vr = col("ssq").cast("double") / col("n") - mean * mean
      val wr = Window.partitionBy("cluster").orderBy(col("d2").desc, col("vec_id"))
      a2.join(broadcast(st), Seq("cluster"))
        .filter(vr > 0)
        .withColumn("zv", (col("d2") - mean) / sqrt(vr))
        .withColumn("rnk", row_number().over(wr))
        .filter(col("rnk") <= 3)
        .select(col("cluster").cast("bigint").as("cluster"), col("vec_id"),
          col("d2").cast("bigint").as("d2"),
          (round(col("zv"), 4) + lit(0.0)).as("zscore"))
        .orderBy(col("cluster"), col("d2").desc, col("vec_id"))
    },

    GraftQuery(
      "q_knn_label_vote",
      "Extension (r10): kNN LABEL-VOTE evaluation — each probe's label predicted by " +
        "majority vote of its 5 brute-force nearest neighbors vs its true label, the " +
        "end-task check that the embedding space actually clusters by label before " +
        "anyone ships it behind a retrieval or labeling endpoint. Composes the " +
        "shared brute-force ranking with one label join + one k-row vote window.",
      s"""WITH $dPr,
         |$dBrute,
         |nb AS (SELECT b.probe_id, e.label FROM brute b
         |       JOIN embeddings e ON e.vec_id = b.neighbor_id WHERE b.rnk <= 5),
         |v AS (SELECT probe_id, label, count(*) AS votes FROM nb GROUP BY 1, 2),
         |p AS (SELECT probe_id, label AS pred, votes FROM v
         |      QUALIFY row_number() OVER (PARTITION BY probe_id
         |                                 ORDER BY votes DESC, label) = 1)
         |SELECT p.probe_id, p.pred::BIGINT AS predicted,
         |       e.label::BIGINT AS actual, p.votes::BIGINT AS votes,
         |       (p.pred = e.label) AS correct
         |FROM p JOIN embeddings e ON e.vec_id = p.probe_id
         |ORDER BY probe_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val lbl = embeddings(s, dir).select(col("vec_id"), col("label"))
      val nb = bruteTop(s, dir, 5)
        .join(lbl.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      val wv = Window.partitionBy("probe_id").orderBy(col("votes").desc, col("label"))
      nb.groupBy("probe_id", "label").agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1)
        .join(lbl.select(col("vec_id").as("probe_id"), col("label").as("actual")),
          Seq("probe_id"))
        .select(col("probe_id"), col("label").cast("bigint").as("predicted"),
          col("actual").cast("bigint").as("actual"),
          col("votes").cast("bigint").as("votes"),
          (col("label") === col("actual")).as("correct"))
        .orderBy("probe_id")
    },

    GraftQuery(
      "q_knn_ivf_kmeans",
      "Extension: IVF ANN with a TRAINED k-means coarse quantizer (delivering the 'swap the " +
        "stand-in labels for a trained quantizer' path of q_knn_ivf): probes rank the k " +
        "centroids by integer d2 and fine-search only the top-4 cells' members with exact " +
        "float cosine — the fine scan reads 3/k of the corpus",
      s"""WITH $dKmeans,
         |$dKmeansIvf
         |SELECT probe_id, neighbor_id, rnk, round(score, 4) AS score
         |FROM kivf WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin) { (s, dir) =>
      kmeansIvfTop(s, dir, 5)
        .select(col("probe_id"), col("neighbor_id"), col("rnk").cast("bigint").as("rnk"),
          round(col("score_raw"), 4).as("score"))
        .orderBy("probe_id", "rnk")
    },

    GraftQuery(
      "q_knn_recall_kmeans",
      "Extension: the ANN quality gate for the TRAINED quantizer — recall@5 of the " +
        "k-means-IVF index against brute-force ground truth per probe (the self-validation " +
        "a 100 TB index build runs on a sampled probe set; q_knn_recall's twin for the " +
        "trained path)",
      s"""WITH $dKmeans,
         |$dKmeansIvf,
         |$dPr,
         |$dBrute
         |SELECT b.probe_id, count(i.neighbor_id) / 5.0 AS recall5
         |FROM (SELECT probe_id, neighbor_id FROM brute WHERE rnk <= 5) b
         |LEFT JOIN (SELECT probe_id, neighbor_id FROM kivf WHERE rnk <= 5) i
         |       ON b.probe_id = i.probe_id AND b.neighbor_id = i.neighbor_id
         |GROUP BY b.probe_id ORDER BY b.probe_id""".stripMargin) { (s, dir) =>
      val b = bruteTop(s, dir, 5).select("probe_id", "neighbor_id")
      val i = kmeansIvfTop(s, dir, 5)
        .select(col("probe_id").as("i_probe"), col("neighbor_id").as("i_neighbor"))
      b.join(i, col("probe_id") === col("i_probe") && col("neighbor_id") === col("i_neighbor"),
          "left")
        .groupBy("probe_id")
        .agg((count(col("i_neighbor")) / lit(5.0)).as("recall5"))
        .orderBy("probe_id")
    },

    GraftQuery(
      "q_knn_mrr",
      "Extension (r10): MRR retrieval eval — the reciprocal rank of each probe's " +
        "TRUE nearest neighbor (brute-force top-1) inside the trained-IVF top-10 " +
        "list, the rank-sensitive quality number recall@k can't see (an index that " +
        "always buries the true hit at rank 9 still scores recall@10 = 1). rr is " +
        "1/rank from an INTEGER rank (0 when the index misses the hit entirely), " +
        "so nothing float crosses engines unrounded.",
      s"""WITH $dKmeans,
         |$dKmeansIvf,
         |$dPr,
         |$dBrute,
         |t1 AS (SELECT probe_id, neighbor_id AS true_top1 FROM brute WHERE rnk = 1),
         |r AS (SELECT t1.probe_id, t1.true_top1, i.rnk AS ivf_rank
         |      FROM t1 LEFT JOIN (SELECT probe_id, neighbor_id, rnk
         |                         FROM kivf WHERE rnk <= 10) i
         |        ON i.probe_id = t1.probe_id AND i.neighbor_id = t1.true_top1)
         |SELECT probe_id, true_top1,
         |       coalesce(ivf_rank, 0)::BIGINT AS ivf_rank,
         |       round(CASE WHEN ivf_rank IS NULL THEN 0.0
         |                  ELSE 1.0 / ivf_rank END, 4) AS rr
         |FROM r ORDER BY probe_id""".stripMargin) { (s, dir) =>
      val t1 = bruteTop(s, dir, 1)
        .select(col("probe_id"), col("neighbor_id").as("true_top1"))
      val i = kmeansIvfTop(s, dir, 10)
        .select(col("probe_id").as("i_probe"), col("neighbor_id").as("i_neighbor"),
          col("rnk"))
      t1.join(i, col("probe_id") === col("i_probe") &&
          col("true_top1") === col("i_neighbor"), "left")
        .select(col("probe_id"), col("true_top1"),
          coalesce(col("rnk"), lit(0L)).cast("bigint").as("ivf_rank"),
          round(when(col("rnk").isNull, 0.0).otherwise(lit(1.0) / col("rnk")), 4)
            .as("rr"))
        .orderBy("probe_id")
    },

    GraftQuery(
      "q_knn_probe_sweep",
      "Extension (r10, widened r11): the ANN TUNING CURVE — recall@5 per probe at " +
        "every nprobe 1..8 (the full-probe limit, where the curve must hit the exact " +
        "1.0) against brute-force ground truth, the sweep an IVF deployment reads to " +
        "pick its probe count (recall rises with probes, scan cost rises linearly — " +
        "the knee is the operating point). The coarse assignment and probe→centroid " +
        "distances are computed ONCE and shared; only the top-nprobe cell cut and the " +
        "per-cell candidate join differ per sweep point. recall5 = hits/5.0 exactly, " +
        "no cross-engine float summation anywhere.",
      s"""WITH $dKmeans,
         |$dKmeansIvf,
         |$dIvfSweep,
         |$dPr,
         |$dBrute
         |SELECT * FROM (
         |${(1 to sweepMaxNprobe).map(np =>
               s"""SELECT $np AS nprobe, b.probe_id, count(i.neighbor_id) / 5.0 AS recall5
                  |FROM (SELECT probe_id, neighbor_id FROM brute WHERE rnk <= 5) b
                  |LEFT JOIN (SELECT probe_id, neighbor_id FROM swivf$np WHERE rnk <= 5) i
                  |       ON b.probe_id = i.probe_id AND b.neighbor_id = i.neighbor_id
                  |GROUP BY b.probe_id""".stripMargin).mkString("\nUNION ALL\n")}
         |) ORDER BY nprobe, probe_id""".stripMargin) { (s, dir) =>
      // ONE shared candidate/score/rank pass for all 8 sweep points (see
      // kmeansIvfSweepTop), then one recall join: the ground-truth side
      // fans out to the 8 sweep points and left-joins the sweep hits —
      // 4 exchanges total where the r11 spelling planned 8 branch plans.
      val b = bruteTop(s, dir, 5).select("probe_id", "neighbor_id")
        .withColumn("nprobe", explode(expr(s"sequence(1, $sweepMaxNprobe)")))
      val i = kmeansIvfSweepTop(s, dir, 5, sweepMaxNprobe)
        .select(col("nprobe").as("i_np"), col("probe_id").as("i_probe"),
          col("neighbor_id").as("i_neighbor"))
      b.join(i,
          col("nprobe") === col("i_np") && col("probe_id") === col("i_probe") &&
            col("neighbor_id") === col("i_neighbor"),
          "left")
        .groupBy("nprobe", "probe_id")
        .agg((count(col("i_neighbor")) / lit(5.0)).as("recall5"))
        .select(col("nprobe").cast("int").as("nprobe"), col("probe_id"), col("recall5"))
        .orderBy("nprobe", "probe_id")
    },

    GraftQuery(
      "q_embedding_pca",
      "Extension (r10): top principal component of the embedding corpus via QUANTIZED " +
        "power iteration — the whitening/compression direction an embedding pipeline " +
        "estimates before projecting (the distributed-PCA shape: the d² Gram/covariance " +
        "matrix aggregates in ONE distributed pass — the only data-scale work, exactly " +
        "MLlib's computeGramianMatrix design — and the 64×64 eigen-iteration runs on " +
        "bounded driver state like the Lloyd update). EVERY step is integer: int8-" +
        "quantized inputs make the covariance numerator n·Σxy − Σx·Σy exact in BIGINT; " +
        "the matrix and the iterate are rescaled to ≤10⁴ by integer division (both " +
        "engines truncate toward zero); 3 fixed iterations from the all-ones vector. " +
        "No float ever appears, so the loading vector hashes bit-identically.",
      s"""WITH $dPca
         |SELECT i::BIGINT AS pos, v AS loading FROM v3 ORDER BY pos""".stripMargin) { (s, dir) =>
      val v = pcaLoading(s, dir)
      val sq = s; import sq.implicits._
      v.zipWithIndex.map { case (l, i) => ((i + 1).toLong, l) }.toSeq
        .toDF("pos", "loading").orderBy("pos")
    },

    GraftQuery(
      "q_embedding_project",
      "Extension (r10): PCA projection + decile bucketing — every vector scored on the " +
        "top component (integer dot of the quantized vector against the quantized " +
        "loading, exact in BIGINT) and binned into deciles for the tail-pruning / " +
        "diversity-balancing curation step. The decile is Q.distributedNtile (the RFM " +
        "machinery reused as a general operator) — exact global ntile, no " +
        "single-reducer sort. Projection itself is a zero-join codegen'd row pass.",
      s"""WITH $dPca,
         |proj AS (SELECT q.vec_id,
         |                list_dot_product(q.qv::DOUBLE[],
         |                  (SELECT list(v ORDER BY i) FROM v3)::DOUBLE[]) AS score
         |         FROM q)
         |SELECT vec_id, score::BIGINT AS score,
         |       ntile(10) OVER (ORDER BY score, vec_id)::INT AS decile
         |FROM proj ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val v = pcaLoading(s, dir)
      val vLit = s"array(${v.map(x => s"${x}L").mkString(",")})"
      // checkpoint the projection before ranking (range sampling would
      // re-run the corpus-wide quantize+dot pass, see q_gini_revenue)
      val proj = Q.materialize(Q.fanout(embeddings(s, dir))
        .select(col("vec_id"),
          expr(s"CAST(vec_dot(${sQuant("embedding")}, $vLit) AS BIGINT)").as("score")))
      Q.distributedNtile(proj, 10, Seq(col("score").asc, col("vec_id")), "decile")
        .orderBy("vec_id")
    },

    GraftQuery(
      "q_embedding_drift",
      "Extension (r10): EMBEDDING drift — PSI of the top-PC projection distribution " +
        "between the corpus's first and second half (by vec_id), per label: the " +
        "embedding-space twin of q_value_psi (a new crawl/model shifting the embedding " +
        "distribution is exactly what this catches before an ANN index goes stale). " +
        "Quartile bins from the BASELINE half (factors .25/.5/.75 are binary-exact on " +
        "integer scores → identical boundaries in both engines), +1-smoothed shares, " +
        "Σ(p2−p1)·ln(p2/p1). Projection scores are the exact integer dots of " +
        "q_embedding_project; the split point is a driver scalar.",
      s"""WITH $dPca,
         |proj AS (SELECT q.vec_id,
         |                list_dot_product(q.qv::DOUBLE[],
         |                  (SELECT list(v ORDER BY i) FROM v3)::DOUBLE[])::BIGINT AS sc
         |         FROM q),
         |pl AS (SELECT p.vec_id, p.sc, e.label,
         |              CASE WHEN p.vec_id < (SELECT (max(vec_id) + 1) // 2 FROM q)
         |                   THEN 1 ELSE 2 END AS period
         |       FROM proj p JOIN embeddings e USING (vec_id)),
         |bq AS (SELECT label, quantile_cont(sc, 0.25) AS b1,
         |              quantile_cont(sc, 0.5) AS b2, quantile_cont(sc, 0.75) AS b3
         |       FROM pl WHERE period = 1 GROUP BY label),
         |binned AS (SELECT pl.label, pl.period,
         |                  1 + (CASE WHEN sc > b1 THEN 1 ELSE 0 END)
         |                    + (CASE WHEN sc > b2 THEN 1 ELSE 0 END)
         |                    + (CASE WHEN sc > b3 THEN 1 ELSE 0 END) AS bin
         |           FROM pl JOIN bq USING (label)),
         |grid AS (SELECT DISTINCT label, unnest(range(1, 5)) AS bin FROM pl),
         |c AS (SELECT g.label, g.bin,
         |             coalesce(sum(CASE WHEN x.period = 1 THEN 1 ELSE 0 END), 0) + 1 AS c1,
         |             coalesce(sum(CASE WHEN x.period = 2 THEN 1 ELSE 0 END), 0) + 1 AS c2
         |      FROM grid g LEFT JOIN binned x ON x.label = g.label AND x.bin = g.bin
         |      GROUP BY 1, 2),
         |n AS (SELECT label, sum(c1) AS n1, sum(c2) AS n2 FROM c GROUP BY 1)
         |SELECT c.label::BIGINT AS label,
         |       round(sum((c2::DOUBLE / n2 - c1::DOUBLE / n1)
         |                 * ln((c2::DOUBLE / n2) / (c1::DOUBLE / n1))), 4) + 0 AS psi,
         |       (max(n1) - 4)::BIGINT AS n_baseline, (max(n2) - 4)::BIGINT AS n_current
         |FROM c JOIN n USING (label)
         |GROUP BY c.label ORDER BY label""".stripMargin) { (s, dir) =>
      val v = pcaLoading(s, dir)
      val vLit = s"array(${v.map(x => s"${x}L").mkString(",")})"
      val emb = embeddings(s, dir)
      val half = emb.agg((max(col("vec_id")) + 1) / 2).head().getDouble(0).toLong
      val pl = Q.fanout(emb).select(col("vec_id"), col("label"),
        expr(s"CAST(vec_dot(${sQuant("embedding")}, $vLit) AS BIGINT)").as("sc"),
        when(col("vec_id") < half, 1).otherwise(2).as("period"))
      val bq = pl.filter(col("period") === 1).groupBy("label")
        .agg(expr(Q.pctl(s, "sc", "0.25D")).as("b1"),
          expr(Q.pctl(s, "sc", "0.5D")).as("b2"),
          expr(Q.pctl(s, "sc", "0.75D")).as("b3"))
      val binCol = (1 to 3).map(i => when(col("sc") > col(s"b$i"), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)
      val binned = pl.join(broadcast(bq), Seq("label")).withColumn("bin", binCol)
        .select(col("label").as("x_label"), col("period"), col("bin").as("x_bin"))
      val grid = pl.select("label").distinct()
        .select(col("label"), explode(array((1 to 4).map(lit(_)): _*)).as("bin"))
      val c = grid.join(binned,
          col("label") === col("x_label") && col("bin") === col("x_bin"), "left")
        .groupBy("label", "bin")
        .agg((coalesce(sum(when(col("period") === 1, 1).otherwise(0)), lit(0)) + 1).as("c1"),
          (coalesce(sum(when(col("period") === 2, 1).otherwise(0)), lit(0)) + 1).as("c2"))
      val wN = org.apache.spark.sql.expressions.Window.partitionBy("label")
      val p1 = col("c1").cast("double") / col("n1")
      val p2 = col("c2").cast("double") / col("n2")
      c.withColumn("n1", sum(col("c1")).over(wN))
        .withColumn("n2", sum(col("c2")).over(wN))
        .groupBy("label")
        .agg((round(sum((p2 - p1) * log(p2 / p1)), 4) + lit(0.0)).as("psi"),
          (max(col("n1")) - 4).cast("bigint").as("n_baseline"),
          (max(col("n2")) - 4).cast("bigint").as("n_current"))
        .select(col("label").cast("bigint").as("label"), col("psi"),
          col("n_baseline"), col("n_current"))
        .orderBy("label")
    },
  )

  /** The quantized-power-iteration PCA loading (see q_embedding_pca for the
    * full design note), cached per (session, dir) like the k-means model:
    * one distributed d² covariance aggregate, then pure-Long driver math.
    */
  private val pcaCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Array[Long]]

  private def pcaLoading(s: SparkSession, dir: String): Array[Long] =
    pcaCache.getOrElseUpdate((s, dir), {
      val qdf = Q.materialize(Q.fanout(embeddings(s, dir))
        .select(col("vec_id"), expr(sQuant("embedding")).as("qv")))
      val n = qdf.count()
      val ex = qdf.select(col("qv"), posexplode(col("qv")).as(Seq("i", "x")))
      val sx = ex.groupBy("i").agg(sum(col("x")).as("sx")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // the one distributed pass: d² cross-product sums (4096 longs collected)
      val prods = ex.select(col("i"), col("x"), posexplode(col("qv")).as(Seq("j", "y")))
        .groupBy("i", "j").agg(sum(col("x") * col("y")).as("sxy"))
        .collect()
      // BigInt, not Long: covariance numerators scale as n²·var(q), which
      // wraps Long past a few million vectors while the DuckDB twin stays
      // exact in HUGEINT — the engines would silently diverge. BigInt `/`
      // truncates toward zero exactly like DuckDB `//`; after the ≤10⁴
      // rescale everything fits Long again (|cs|≤1e4, matvec ≤ 6.4e9).
      val c = Array.ofDim[BigInt](64, 64)
      for (i <- 0 until 64; j <- 0 until 64) c(i)(j) = BigInt(0)
      prods.foreach { r =>
        c(r.getInt(0))(r.getInt(1)) =
          BigInt(n) * BigInt(r.getLong(2)) - BigInt(sx(r.getInt(0))) * BigInt(sx(r.getInt(1)))
      }
      val maxC = c.flatten.map(_.abs).max.max(BigInt(1))
      val cs = c.map(_.map(x => (x * 10000 / maxC).toLong))
      var v = Array.fill(64)(10000L)
      for (_ <- 1 to 3) {
        val w = Array.tabulate(64)(i => (0 until 64).map(j => cs(i)(j) * v(j)).sum)
        val m = math.max(w.map(math.abs).max, 1L)
        v = w.map(x => x * 10000L / m)
      }
      v
    })

  /** DuckDB twin of [[pcaLoading]]: quantized corpus `q`, integer covariance
    * numerator `c0`, ≤10⁴-rescaled `cs`, three matvec+rescale blocks, final
    * loading `v3(i, v)`. MATERIALIZED throughout (multi-referenced CTEs).
    */
  private lazy val dPca: String =
    s"""q AS MATERIALIZED (SELECT vec_id, ${dQuant("embedding")}::BIGINT[] AS qv FROM embeddings),
       |ex AS MATERIALIZED (SELECT vec_id, unnest(qv) AS x, unnest(range(1, 65)) AS i FROM q),
       |sx AS MATERIALIZED (SELECT i, sum(x) AS s FROM ex GROUP BY i),
       |nn AS (SELECT count(*) AS n FROM q),
       |cxy AS MATERIALIZED (SELECT a.i, b.i AS j, sum(a.x * b.x) AS sxy
       |       FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
       |c0 AS MATERIALIZED (SELECT cxy.i, cxy.j,
       |              (SELECT n FROM nn) * sxy - sa.s * sb.s AS cv
       |       FROM cxy JOIN sx sa ON sa.i = cxy.i JOIN sx sb ON sb.i = cxy.j),
       |mc AS (SELECT greatest(max(abs(cv)), 1) AS m FROM c0),
       |cs AS MATERIALIZED (SELECT i, j, (cv * 10000 // (SELECT m FROM mc))::BIGINT AS cv FROM c0),
       |v0 AS (SELECT i, 10000::BIGINT AS v FROM range(1, 65) t(i)),
       |w1 AS MATERIALIZED (SELECT cs.i, sum(cs.cv * v0.v) AS w FROM cs JOIN v0 ON v0.i = cs.j GROUP BY 1),
       |v1 AS MATERIALIZED (SELECT i, (w * 10000 // (SELECT greatest(max(abs(w)), 1) FROM w1))::BIGINT AS v FROM w1),
       |w2 AS MATERIALIZED (SELECT cs.i, sum(cs.cv * v1.v) AS w FROM cs JOIN v1 ON v1.i = cs.j GROUP BY 1),
       |v2 AS MATERIALIZED (SELECT i, (w * 10000 // (SELECT greatest(max(abs(w)), 1) FROM w2))::BIGINT AS v FROM w2),
       |w3 AS MATERIALIZED (SELECT cs.i, sum(cs.cv * v2.v) AS w FROM cs JOIN v2 ON v2.i = cs.j GROUP BY 1),
       |v3 AS MATERIALIZED (SELECT i, (w * 10000 // (SELECT greatest(max(abs(w)), 1) FROM w3))::BIGINT AS v FROM w3)""".stripMargin

  /** Trained-quantizer IVF ranking (probe → top-`kmeansNprobe` k-means
    * cells → exact cosine over cell members): (probe_id, neighbor_id, rnk,
    * score_raw). Shared by q_knn_ivf_kmeans and its recall gate.
    *
    * nprobe=4 of 8 cells (r10): the retrained quantizer (farthest-point +
    * 5 Lloyd iterations) improved inertia but dropped recall@5 at nprobe=3
    * vs the probe-lucky first-8-rows seeding (0.92 → 0.76 — this corpus
    * has no real cluster structure, so near neighbors straddle cell
    * borders). One more probed cell buys the recall back while still
    * pruning half the corpus; the gate in KmeansGateSpec holds the line.
    */
  private def kmeansIvfTop(s: SparkSession, dir: String, k: Int,
      nprobe: Int = kmeansNprobe): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (assignedRaw, c1) = kmeansModel(s, dir)
    val assigned = assignedRaw
      .select(col("vec_id"), col("embedding").as("ce"), col("__a2.cid").as("cluster"))
    val sq = s; import sq.implicits._
    // the trained quantizer is k×d longs — a literal broadcast table
    val cents = c1.map { case (cid, cv) => (cid, cv.toArray) }.toDF("cid", "cv")
    val probes = embeddings(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        expr(sQuant("embedding")).as("qp"))
    val wSel = Window.partitionBy("probe_id").orderBy(col("__d2"), col("cid"))
    val sel = probes.crossJoin(broadcast(cents))
      .withColumn("__d2", expr("vec_l2sq(qp, cv)"))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") <= nprobe)
      .select("probe_id", "pe", "cid")
    val wk = Window.partitionBy("probe_id").orderBy(col("score_raw").desc, col("neighbor_id"))
    sel.join(assigned, col("cluster") === col("cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        expr(sCos("ce", "pe")).as("score_raw"))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
  }

  /** The WHOLE nprobe sweep 1..maxNprobe in one shared pass (r12,
    * guide §2.4): the r11 spelling built maxNprobe independent branch
    * plans — each re-joining candidates to the corpus, re-scoring and
    * re-ranking — though the np-point candidate set is just the np=max
    * set filtered to cell rank ≤ np. Here candidates are scored ONCE with
    * their cell rank riding along, each row fans out to the sweep points
    * that probe it (np = rn..max, a bounded ≤max× explode of the RARE
    * candidate slice), and a single (nprobe, probe_id) window ranks all
    * sweep points together. Row-for-row equal to per-np kmeansIvfTop:
    * same deterministic cell cut (d2, cid) and same (score desc,
    * neighbor_id) ranking. Returns (nprobe, probe_id, neighbor_id, rnk ≤ k).
    */
  private def kmeansIvfSweepTop(
      s: SparkSession, dir: String, k: Int, maxNprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (assignedRaw, c1) = kmeansModel(s, dir)
    val assigned = assignedRaw
      .select(col("vec_id"), col("embedding").as("ce"), col("__a2.cid").as("cluster"))
    val sq = s; import sq.implicits._
    val cents = c1.map { case (cid, cv) => (cid, cv.toArray) }.toDF("cid", "cv")
    val probes = embeddings(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        expr(sQuant("embedding")).as("qp"))
    val wSel = Window.partitionBy("probe_id").orderBy(col("__d2"), col("cid"))
    val sel = probes.crossJoin(broadcast(cents))
      .withColumn("__d2", expr("vec_l2sq(qp, cv)"))
      .withColumn("rn", row_number().over(wSel)).filter(col("rn") <= maxNprobe)
      .select("probe_id", "pe", "cid", "rn")
    val wk = Window.partitionBy("nprobe", "probe_id")
      .orderBy(col("score_raw").desc, col("neighbor_id"))
    sel.join(assigned, col("cluster") === col("cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("rn"), col("vec_id").as("neighbor_id"),
        expr(sCos("ce", "pe")).as("score_raw"))
      .withColumn("nprobe", explode(expr(s"sequence(rn, $maxNprobe)")))
      .withColumn("rnk", row_number().over(wk))
      .filter(col("rnk") <= k)
      .select("nprobe", "probe_id", "neighbor_id", "rnk")
  }

  /** DuckDB twin of [[kmeansIvfTop]] (needs [[dKmeans]] in scope):
    * kpr → kpc (probe→centroid integer d2) → ksel (top-nprobe cells) → kcand →
    * kscored → kivf(probe_id, neighbor_id, score, rnk). Distinct CTE names
    * so it composes with dPr/dBrute in the recall oracle. */
  // lazy: declared after `all`, which interpolates it at object init
  private lazy val dKmeansIvf =
    s"""kpr AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pe,
       |              ${dQuant("embedding")}::BIGINT[] AS qp
       |       FROM embeddings WHERE vec_id < 5),
       |kpc AS (SELECT kpr.probe_id, c.cid,
       |              CAST(list_dot_product(kpr.qp::DOUBLE[], kpr.qp::DOUBLE[])
       |                 - 2 * list_dot_product(kpr.qp::DOUBLE[], c.cv::DOUBLE[])
       |                 + list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[]) AS BIGINT) AS d2
       |       FROM kpr CROSS JOIN cf c),
       |ksel AS (SELECT probe_id, cid FROM kpc
       |        QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d2, cid) <= $kmeansNprobe),
       |kcand AS (SELECT s.probe_id, a2.vec_id FROM ksel s JOIN a2 ON a2.cluster = s.cid),
       |kscored AS (SELECT c.probe_id, c.vec_id AS neighbor_id,
       |                  ${dCos("e.embedding::DOUBLE[]", "kpr.pe")} AS score
       |           FROM kcand c
       |           JOIN embeddings e ON e.vec_id = c.vec_id
       |           JOIN kpr ON kpr.probe_id = c.probe_id
       |           WHERE c.vec_id <> c.probe_id),
       |kivf AS (SELECT probe_id, neighbor_id, score,
       |              row_number() OVER (PARTITION BY probe_id
       |                                 ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM kscored)""".stripMargin

  /** Per-nprobe chains for the probe sweep — kpr/kpc are shared with
    * [[dKmeansIvf]]; only the top-nprobe cell cut (and everything after
    * it) varies, so each nprobe gets its own kselN→kcandN→kivfN chain.
    */
  private lazy val dIvfSweep: String = (1 to sweepMaxNprobe).map { np =>
    // `sw` prefix: dKmeans already owns kcand$j for its seeding chain
    s"""swsel$np AS (SELECT probe_id, cid FROM kpc
       |        QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d2, cid) <= $np),
       |swcand$np AS (SELECT s.probe_id, a2.vec_id FROM swsel$np s JOIN a2 ON a2.cluster = s.cid),
       |swscored$np AS (SELECT c.probe_id, c.vec_id AS neighbor_id,
       |                  ${dCos("e.embedding::DOUBLE[]", "kpr.pe")} AS score
       |           FROM swcand$np c
       |           JOIN embeddings e ON e.vec_id = c.vec_id
       |           JOIN kpr ON kpr.probe_id = c.probe_id
       |           WHERE c.vec_id <> c.probe_id),
       |swivf$np AS (SELECT probe_id, neighbor_id,
       |              row_number() OVER (PARTITION BY probe_id
       |                                 ORDER BY score DESC, neighbor_id) AS rnk
       |       FROM swscored$np)""".stripMargin
  }.mkString(",\n")
}
