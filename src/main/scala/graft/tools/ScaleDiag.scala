package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage-level localization for scaling-audit outliers (r11):
  * times the component sub-plans of the keys whose sf10/sf1 ratio bends
  * above linear, so the fix targets the stage that actually bends.
  * Usage: runMain graft.tools.ScaleDiag <sfDir> <which: abc|minhash|novelty>
  */
object ScaleDiag {

  private def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"DIAG $tag sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    which match {
      case "abc" =>
        val li = graft.tables.Tables.table(spark, dir, "lineitem")
        time("lineitem-count")(println(li.count()))
        val r = li.groupBy("l_partkey")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))).as("rev"))
        time("decimal-agg")(println(r.count()))
        val dbl = li.groupBy("l_partkey")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        time("double-agg")(println(dbl.count()))
        val rp = r.repartitionByRange(col("rev").desc, col("l_partkey"))
          .withColumn("pid", spark_partition_id())
        time("range-partition+pid")(println(rp.count()))
        val m = time("materialize")(graft.queries.Q.materialize(rp))
        time("ptots")(println(m.groupBy("pid").agg(sum(col("rev"))).count()))
        time("full-key")(println(
          graft.Registry.byName("q_abc_analysis").run(spark, dir).count()))

      case "minhash" =>
        val bands = graft.queries.QDedup.bandedSignatures(spark, dir)
        time("banded-signatures")(println(bands.count()))
        val sizes = bands.groupBy("band_id", "k").count()
        time("bucket-sizes")(
          sizes.orderBy(col("count").desc).limit(10).collect()
            .foreach(r => println(s"DIAG bucket band=${r.get(0)} k=${r.get(1)} size=${r.getLong(2)}")))
        time("pair-count")(println(
          sizes.agg(sum(col("count") * (col("count") - 1) / 2)).head()))

      case "ann" =>
        // the corpus-scaled IVF store at this SF: build (auto k = cellsFor),
        // then the recall/latency curve of searchBatch vs brute force
        import org.apache.spark.sql.expressions.Window
        import graft.sinks.VectorIndexStore
        graft.functions.VectorMath.register(spark)
        val emb = graft.tables.Tables.embeddings(spark, dir).select("vec_id", "embedding")
        val n = emb.count()
        val k = graft.functions.Kmeans.cellsFor(n)
        println(s"DIAG ann corpus=$n cellsFor=$k")
        val idx = java.nio.file.Files.createTempDirectory("annsf").toFile.getPath
        time("build")(VectorIndexStore.build(spark, emb, idx))
        val cells = spark.read.parquet(s"$idx/lists").select("cluster").distinct().count()
        println(s"DIAG ann populated_cells=$cells")
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
        val wB = Window.partitionBy("probe_id").orderBy(col("s").desc, col("vec_id"))
        val truth = time("brute-truth")(probes.crossJoin(emb)
          .filter(col("vec_id") =!= col("probe_id"))
          .withColumn("s", expr("vec_cos(embedding, pe)"))
          .withColumn("r", org.apache.spark.sql.functions.row_number().over(wB))
          .filter(col("r") <= 5)
          .select("probe_id", "vec_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap)
        for (np <- Seq(1, k / 32, k / 8, k / 2).map(math.max(_, 1)).distinct) {
          val t0 = System.nanoTime()
          val got = VectorIndexStore.searchBatch(spark, idx,
              probes.select(col("probe_id"), col("pe").as("embedding")),
              topK = 6, nprobe = np)
            .filter(col("vec_id") =!= col("probe_id")).filter(col("rnk") <= 6)
            .select("probe_id", "vec_id").collect()
            .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).take(5).toSet).toMap
          val sec = (System.nanoTime() - t0) / 1e9
          val rec = truth.keys.toSeq.map { p =>
            (truth(p) intersect got.getOrElse(p, Set.empty)).size.toDouble / 5.0
          }.sum / truth.size
          println(f"DIAG ann nprobe=$np%d frac_read=${np.toDouble / k}%.3f recall5=$rec%.2f sec=$sec%.1f")
        }

      case "pctl" =>
        // r12 (VERDICT r11 #3): exact interpolated percentile vs the
        // graft.percentile.approx tier over the whole Q.pctl family —
        // the timing half of PercentileApproxGateSpec's deviation gates.
        val family = Seq("q_agg_percentile", "q_anomaly_mad", "q_anomaly_ensemble",
          "q_value_psi", "q_winsorize", "q_embedding_drift", "q_win_rolling_median")
        for (mode <- Seq("exact", "approx"); key <- family) {
          spark.conf.set("graft.percentile.approx", (mode == "approx").toString)
          // count() executes the full aggregate without driver-collecting rows
          time(s"$mode $key")(println(
            graft.Registry.byName(key).run(spark, dir).count()))
        }
        spark.conf.unset("graft.percentile.approx")

      case "decon" =>
        // r12: localize q_decontaminate's sf1 board bend (7.2x at 10x)
        val grams0 = graft.tables.Tables.documents(spark, dir)
          .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
          .filter(size(col("toks")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(toks) - 4), i -> concat_ws(' ', slice(toks, i, 5)))"
          )).as("gram"))
        time("grams-count")(println(grams0.count()))
        val grams = time("materialize")(graft.queries.Q.materialize(grams0))
        val bench = grams.filter(col("doc_id") < 10).select("gram").distinct()
        time("bench-distinct")(println(bench.count()))
        val joined = grams.filter(col("doc_id") >= 10).join(broadcast(bench), "gram")
        time("join-count")(println(joined.count()))
        val scored = joined.groupBy("doc_id")
          .agg(count_distinct(col("gram")).as("shared"))
        time("scored")(println(scored.count()))
        time("full-key")(println(
          graft.Registry.byName("q_decontaminate").run(spark, dir).count()))

      case "novelty" =>
        graft.functions.TextHash.register(spark)
        val g = graft.tables.Tables.table(spark, dir, "documents")
          .withColumn("toks", split(lower(col("text")), " "))
          .filter(size(col("toks")) >= 3)
          .withColumn("hs", expr("shingle_hashes(toks)"))
          .select(col("doc_id"), explode(col("hs")).as("g"))
        time("grams-explode")(println(g.count()))
        val gm = time("grams-materialize")(graft.queries.Q.materialize(g))
        val f = gm.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        time("first-agg")(println(f.count()))
        time("join-back")(println(gm.join(f, Seq("g")).count()))
        time("full-key")(println(
          graft.Registry.byName("q_ngram_novelty").run(spark, dir).count()))
    }
    spark.stop()
  }
}
