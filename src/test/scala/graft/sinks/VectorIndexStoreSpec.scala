package graft.sinks

import graft.SparkTestBase
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The r10 lifecycle contract for the IVF store (VERDICT r9 #6): write new
  * embeddings → tick → a probe finds them WITHOUT a full rebuild (the
  * centroid artifact is byte-identical across the incremental tick), and
  * the retrain threshold still triggers the full fold when delta dwarfs
  * the indexed corpus.
  */
class VectorIndexStoreSpec extends SparkTestBase {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("vecidx").toFile
    d.deleteOnExit(); d.getPath
  }

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .select("vec_id", "embedding")

  private def centroids(dir: String) =
    spark.read.parquet(s"$dir/centroids.parquet")
      .orderBy("cid").collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSeq

  test("build → search returns exact cosine top-k from the probed cells only") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val probeVec = corpus.filter(col("vec_id") === 3L)
      .head().getSeq[Float](1).map(_.toDouble)
    val hits = VectorIndexStore.search(spark, dir, probeVec, topK = 5).collect()
    assert(hits.length === 5)
    // the probe vector itself is in the corpus → must be its own top hit
    assert(hits.head.getLong(0) === 3L && math.abs(hits.head.getDouble(1) - 1.0) < 1e-9)
    // scores descend
    assert(hits.map(_.getDouble(1)).sliding(2).forall(p => p(0) >= p(1)))
    // fine scan pruned: every hit comes from one of the 3 probed cells
    assert(hits.map(_.getInt(2)).distinct.length <= 3)
  }

  test("append lands in delta (index stale), tick folds it in WITHOUT retraining, probe finds it") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val centsBefore = centroids(dir)

    // a new vector engineered to be the global nearest neighbor of itself:
    // clone vector 3's embedding under a fresh id
    val donor = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1)
    val sq = spark; import sq.implicits._
    val newVecs = Seq((100001L, donor)).toDF("vec_id", "embedding")
    VectorIndexStore.append(spark, newVecs, dir)
    assert(VectorIndexStore.staleCount(spark, dir) === 1L)

    // pre-tick: the staleness window — the probe does NOT see the new id
    val probe = donor.map(_.toDouble)
    val pre = VectorIndexStore.search(spark, dir, probe, topK = 5).collect()
    assert(!pre.map(_.getLong(0)).contains(100001L))

    // tick: incremental (1 ≪ 50% of 500) — no retrain, centroids untouched
    val (indexed, retrained) = VectorIndexStore.tick(spark, dir)
    assert(indexed === 1L && !retrained)
    assert(centroids(dir) === centsBefore, "incremental tick must not move centroids")
    assert(VectorIndexStore.staleCount(spark, dir) === 0L)

    // post-tick: the clone scores cosine 1.0 and ranks in the top hits
    val post = VectorIndexStore.search(spark, dir, probe, topK = 5).collect()
    assert(post.map(_.getLong(0)).contains(100001L),
      s"probe must find the newly indexed vector, got ${post.map(_.getLong(0)).toSeq}")
    // and a second tick is a no-op
    assert(VectorIndexStore.tick(spark, dir) === ((0L, false)))
  }

  test("searchBatch == per-probe search for every probe in the frame") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val probes = corpus.filter(col("vec_id") < 4L)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val batched = VectorIndexStore.searchBatch(spark, dir, probes, topK = 5)
      .collect().groupBy(_.getLong(0))
    (0L until 4L).foreach { pid =>
      val single = VectorIndexStore.search(spark, dir,
          corpus.filter(col("vec_id") === pid).head().getSeq[Float](1).map(_.toDouble),
          topK = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val b = batched(pid).sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2)))
      assert(b.toSeq === single.toSeq, s"probe $pid diverged")
    }
  }

  test("crash between fold and cleanup: the next tick does not duplicate delta vectors") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val donor = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1)
    val sq = spark; import sq.implicits._
    VectorIndexStore.append(spark, Seq((100001L, donor)).toDF("vec_id", "embedding"), dir)
    // simulate the worst crash window: the fold COMMITTED its list-append
    // but died before clearing the marker — i.e. run a full tick, then
    // resurrect delta/ as delta.folding/ with the same vector
    assert(VectorIndexStore.tick(spark, dir)._1 === 1L)
    Seq((100001L, donor)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/delta.folding")
    VectorIndexStore.tick(spark, dir) // recovery path
    val copies = spark.read.parquet(s"$dir/lists")
      .filter(col("vec_id") === 100001L).count()
    assert(copies === 1L, s"recovery must not duplicate the folded vector (got $copies)")
    assert(!new java.io.File(s"$dir/delta.folding").exists())
    // the opposite window — fold never committed — must not LOSE the vector
    Seq((100002L, donor)).toDF("vec_id", "embedding")
      .write.parquet(s"$dir/delta.folding")
    VectorIndexStore.tick(spark, dir)
    assert(spark.read.parquet(s"$dir/lists")
      .filter(col("vec_id") === 100002L).count() === 1L)
  }

  test("crash mid retrain-swap: an uncommitted build rolls back, a half-commit rolls forward") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val before = spark.read.parquet(s"$dir/lists").count()
    // uncommitted build: both .building dirs present, live index intact →
    // next tick discards them and the index is unchanged
    spark.read.parquet(s"$dir/centroids.parquet")
      .write.parquet(s"$dir/centroids.building.parquet")
    spark.read.parquet(s"$dir/lists").write.partitionBy("cluster")
      .parquet(s"$dir/lists.building")
    VectorIndexStore.tick(spark, dir)
    assert(!new java.io.File(s"$dir/lists.building").exists())
    assert(!new java.io.File(s"$dir/centroids.building.parquet").exists())
    assert(spark.read.parquet(s"$dir/lists").count() === before)
    // half-commit: centroids renamed (cb gone), lists swap pending → next
    // tick adopts lists.building
    val sq = spark; import sq.implicits._
    val donor = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1)
    spark.read.parquet(s"$dir/lists")
      .unionByName(Seq((200001L, donor, 0)).toDF("vec_id", "embedding", "cluster"))
      .write.partitionBy("cluster").parquet(s"$dir/lists.building")
    VectorIndexStore.tick(spark, dir)
    assert(spark.read.parquet(s"$dir/lists").count() === before + 1)
    assert(spark.read.parquet(s"$dir/lists")
      .filter(col("vec_id") === 200001L).count() === 1L)
  }

  test("a delta larger than the retrain fraction triggers the full fold") {
    val dir = freshDir()
    val sq = spark; import sq.implicits._
    val half = corpus.filter(col("vec_id") < 250L)
    val rest = corpus.filter(col("vec_id") >= 250L)
    VectorIndexStore.build(spark, half, dir)
    VectorIndexStore.append(spark, rest, dir)
    val (indexed, retrained) = VectorIndexStore.tick(spark, dir)
    assert(indexed === rest.count() && retrained, "delta > 50% of indexed must retrain")
    // the rebuilt index covers the full corpus
    val n = spark.read.parquet(s"$dir/lists").count()
    assert(n === corpus.count())
  }

  test("checkDim is crash-atomic: records once, rejects mismatches, fails loud on a corrupt empty marker (ADVICE r11)") {
    val dir = freshDir()
    VectorIndexStore.checkDim(dir, 8)   // first caller records
    VectorIndexStore.checkDim(dir, 8)   // same dim passes
    assert(VectorIndexStore.dimOf(dir) === Some(8))
    intercept[IllegalArgumentException](VectorIndexStore.checkDim(dir, 16))
    // a pre-fix crash orphan (empty marker) must throw, not silently
    // disable enforcement
    val dim = new java.io.File(dir, "dim")
    java.nio.file.Files.writeString(dim.toPath, ""): Unit
    intercept[IllegalStateException](VectorIndexStore.checkDim(dir, 8))
    // no stray temp files left behind by the link-into-place protocol
    val strays = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp"))
    assert(strays.isEmpty, strays.mkString(","))
  }

  test("centroid cache: a retrain bumps the generation and searches see the NEW centroids (r12, VERDICT r11 #2)") {
    val dir = freshDir()
    val half = corpus.filter(col("vec_id") < 250L)
    val rest = corpus.filter(col("vec_id") >= 250L)
    VectorIndexStore.build(spark, half, dir)
    assert(VectorIndexStore.generation(dir) === 1L)
    // warm the driver-side cache with generation-1 centroids
    val donor = corpus.filter(col("vec_id") === 400L).head().getSeq[Float](1)
    val probe = donor.map(_.toDouble)
    VectorIndexStore.search(spark, dir, probe, topK = 3).collect(): Unit
    val centsG1 = centroids(dir)
    // retrain from a corpus 3x the indexed half — centroids move
    VectorIndexStore.append(spark, rest, dir)
    val (_, retrained) = VectorIndexStore.tick(spark, dir)
    assert(retrained)
    assert(VectorIndexStore.generation(dir) === 2L,
      "retrain commit must bump the generation marker")
    assert(centroids(dir) !== centsG1, "retrain over 3x the corpus must move centroids")
    // a stale cache would probe gen-1 cells against gen-2 lists: vector
    // 400 (only in the retrained corpus) must now be its own top hit —
    // proof the search went through the NEW centroid table
    val post = VectorIndexStore.search(spark, dir, probe, topK = 3).collect()
    assert(post.head.getLong(0) === 400L && math.abs(post.head.getDouble(1) - 1.0) < 1e-9,
      s"post-retrain search must find vec 400 via the new centroids, got ${post.toSeq}")
    // incremental ticks leave centroids untouched but DO bump the
    // generation (r12: cell membership changed — the hot-cell cache must
    // not serve the pre-fold cell), and the freshly folded vector is
    // visible through the caches immediately
    val sq = spark; import sq.implicits._
    VectorIndexStore.append(spark,
      Seq((300001L, donor)).toDF("vec_id", "embedding"), dir)
    assert(VectorIndexStore.tick(spark, dir) === ((1L, false)))
    assert(VectorIndexStore.generation(dir) >= 3L,
      "incremental fold must bump the generation (cell-cache invalidation); " +
        "a post-fold lists compaction may add one more bump")
    val folded = VectorIndexStore.search(spark, dir, probe, topK = 3).collect()
    assert(folded.map(_.getLong(0)).contains(300001L),
      s"post-fold search must see the folded vector, got ${folded.toSeq}")
  }

  test("lists compaction: accreted fold files rewrite to ~one per cluster; results identical (r12)") {
    val dir = freshDir()
    val sq = spark; import sq.implicits._
    VectorIndexStore.build(spark, corpus, dir)
    val probe = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1).map(_.toDouble)
    val donor = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1)
    def listsFiles(): Int = {
      val d = new java.io.File(s"$dir/lists")
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .map(cd => cd.listFiles().count(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))).sum
    }
    try {
      val before = VectorIndexStore.search(spark, dir, probe, topK = 5).collect()
      // accrete: folds append one file per touched cluster while the
      // threshold is out of reach
      spark.conf.set("graft.ann.compactFilesPerCell", "1000000")
      val base = listsFiles()
      for (i <- 0 until 4) {
        VectorIndexStore.append(spark,
          Seq((200001L + i, donor)).toDF("vec_id", "embedding"), dir)
        VectorIndexStore.tick(spark, dir)
      }
      assert(listsFiles() === base + 4, "each fold should add one file")
      // threshold 1: the next tick's fold pushes past one file per cell
      // and the compaction rewrite collapses the accretion
      spark.conf.set("graft.ann.compactFilesPerCell", "1")
      VectorIndexStore.append(spark,
        Seq((200100L, donor)).toDF("vec_id", "embedding"), dir)
      VectorIndexStore.tick(spark, dir)
      val nCells = Option(new java.io.File(s"$dir/lists").listFiles()).get
        .count(_.getName.startsWith("cluster="))
      assert(listsFiles() <= nCells, s"${listsFiles()} files over $nCells cells after compaction")
      // content preserved: the original corpus hits are still served
      val after = VectorIndexStore.search(spark, dir, probe, topK = 5).collect()
      assert(after.head.getLong(0) === before.head.getLong(0))
    } finally spark.conf.unset("graft.ann.compactFilesPerCell")
  }

  test("compaction crash states recover: half-written stage rolls back, post-rm stage rolls forward (r12)") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val probe = corpus.filter(col("vec_id") === 3L).head().getSeq[Float](1).map(_.toDouble)
    val lists = new java.io.File(s"$dir/lists")
    val lc = new java.io.File(s"$dir/lists.compacting")
    // (a) crash mid-rewrite: stage next to live lists → recovery rolls back
    lc.mkdirs()
    new java.io.File(lc, "cluster=0").mkdirs()
    VectorIndexStore.tick(spark, dir) // recoverFolding runs first
    assert(!lc.exists() && lists.exists(), "half-written stage must roll back")
    assert(VectorIndexStore.search(spark, dir, probe, topK = 1).collect().nonEmpty)
    // (b) crash between rm(lists) and rename: stage alone → roll forward
    val gen0 = VectorIndexStore.generation(dir)
    assert(lists.renameTo(lc)) // simulate: rewrite completed, rm(lists) ran
    VectorIndexStore.tick(spark, dir)
    assert(lists.exists() && !lc.exists(), "completed stage must roll forward")
    assert(VectorIndexStore.generation(dir) > gen0, "adoption must bump the generation")
    assert(VectorIndexStore.search(spark, dir, probe, topK = 1)
      .collect().head.getLong(0) === 3L)
  }

  test("hot-cell cache: bit-identical to the Spark fine scan, and job-free once resident (r12)") {
    val dir = freshDir()
    VectorIndexStore.build(spark, corpus, dir)
    val probe = corpus.filter(col("vec_id") === 7L)
      .head().getSeq[Float](1).map(_.toDouble)
    val cached = VectorIndexStore.search(spark, dir, probe, topK = 10).collect()
    spark.conf.set("graft.ann.cellCacheMB", "0")
    val viaSpark =
      try VectorIndexStore.search(spark, dir, probe, topK = 10).collect()
      finally spark.conf.unset("graft.ann.cellCacheMB")
    // same ids, same clusters, scores bit-equal (cosF mirrors vec_cos's
    // accumulation order exactly)
    assert(cached.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq ===
      viaSpark.map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq)
    // with the probed cells resident, the result is a LocalRelation —
    // collect() runs zero Spark jobs (the serving-latency point)
    val plan = VectorIndexStore.search(spark, dir, probe, topK = 10)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected LocalRelation, got:\n$plan")
  }
}
