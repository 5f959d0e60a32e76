package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst predicate pushdown /
  * column pruning apply unimpeded; the only special case is `events`,
  * whose `ts` column the driver has shipped in two vintages (see
  * [[events]]).  When rebuilding timestamps from raw nanos, integer
  * division only — epoch nanos (~1.7e18) exceed a Double's 2^53
  * exact-integer range, so any float math there would corrupt them.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  /** Per-session scan-relation cache (r12, guide §6 "file listing").
    *
    * `spark.read.parquet(path)` lists the path and reads a footer for
    * schema inference EVERY call; the query inventory creates ~2-4 scans
    * per key × 252 keys × 3 bench passes, so the driver pays the same
    * listing/footer work thousands of times per run. A catalog-backed
    * engine resolves a table's schema once per session — this cache is
    * that behavior for the path-based loaders: the ANALYZED scan
    * DataFrame (logical relation only, never rows — each query still
    * computes from parquet) is built once per (session, path).
    *
    * Eviction (ADVICE r12): the weak key alone cannot fire — the cached
    * DataFrames strongly reference their session (df.sparkSession), so the
    * value chain pins the key. A context listener therefore evicts the
    * session's entry on SparkListenerApplicationEnd (every stop() path in
    * tests/bench/verify ends the context), and the WeakHashMap stays as
    * belt-and-braces for contexts that are never stopped.
    */
  private val relationCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  /** ONE eviction listener per SparkContext (r13 review): a per-SESSION
    * listener would itself accumulate on a long-lived shared context. On
    * application end the listener drops every cached session of that
    * context (they all die with it). Residual, documented: sessions
    * churned on a STILL-LIVE context keep their entries until it ends —
    * inherent while the cached values strongly reference their session.
    */
  private val evictorRegistered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.SparkContext, java.lang.Boolean]())

  private def ensureEvictor(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    if (evictorRegistered.putIfAbsent(sc, java.lang.Boolean.TRUE) == null)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          relationCache.synchronized {
            val it = relationCache.keySet.iterator()
            while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
          }
      })
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Pin the timestamp-inference confs BEFORE every cached read: parquet
    // TIMESTAMP(isAdjustedToUTC=false) columns (lineitem.l_shipdate,
    // events.ts micros vintage) would otherwise infer as TimestampNTZ or
    // TimestampType depending on WHICH caller read them first — the
    // session-wide flip used to happen lazily on the first Tables.events
    // call, which made the cached schema order-dependent (caught by
    // SchemaCheckSpec under full-suite ordering). Session TZ is pinned
    // UTC everywhere, so the epochs are identical either way; pinning
    // here makes the inferred TYPE deterministic too.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // evict on context end so the session ⇄ DataFrame cycle can be
    // collected (ADVICE r12 — the weak key alone never fires)
    ensureEvictor(spark)
    val perSession = relationCache.synchronized {
      var m = relationCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        relationCache.put(spark, m)
      }
      m
    }
    // Plain path key: table() OWNS the two timestamp-inference confs (pinned
    // above on every call), so the inferred schema cannot vary per caller —
    // the r12 conf-suffixed events key was dead code (always
    // "#nanos=true#ntz=false"; ADVICE r12). SchemaCheckSpec reads the raw
    // vintage with its own spark.read, not through this cache.
    val path = s"$dir/$name.parquet"
    perSession.computeIfAbsent(path, _ => spark.read.parquet(path))
  }

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` with both a TimestampType `ts` and its raw epoch-nanos twin
    * `ts_ns` (LONG), whichever vintage the parquet file carries:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it, so we read nanos as a
    *    raw long (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a
    *    microsecond `ts`.  Here `ts_ns` is the NATIVE column — filter on it
    *    for parquet row-group pruning.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): read as TimestampType,
    *    not NTZ (`inferTimestampNTZ=false`) — the session timezone is
    *    pinned UTC everywhere, so the epoch is identical, and a NATIVE
    *    `ts` keeps time predicates pushing down to row-group stats.  Here
    *    `ts_ns` is derived, so prefer filtering on `ts` (see
    *    [[graft.tables.Tables.eventsTimeBound]] for the one helper that
    *    pushes a nanos interval onto whichever column is native).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType => // belt-and-braces: identical epoch under UTC
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case _ =>
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
  }

  /** Filter `df` (an [[events]] frame, or anything carrying `ts` + `ts_ns`)
    * to the half-open nanos interval [lo, hi).  Emits the predicate on the
    * TIMESTAMP column — the native, pushdown-able one in the current
    * testdata vintage — whenever the bounds are micro-representable, which
    * `ts_ns` values always are (every stored nanos is micros*1000), plus
    * the exact `ts_ns` bound for sub-microsecond `lo`/`hi` literals.
    */
  def eventsTimeBound(df: DataFrame, lo: Long, hi: Long): DataFrame = {
    val loC =
      if (lo == Long.MinValue) lit(true)
      else if (lo % 1000 == 0) col("ts") >= timestamp_micros(lit(lo / 1000))
      else col("ts_ns") >= lo
    val hiC =
      if (hi == Long.MaxValue) lit(true)
      else if (hi % 1000 == 0) col("ts") < timestamp_micros(lit(hi / 1000))
      else col("ts_ns") < hi
    df.filter(loC && hiC)
  }
}
