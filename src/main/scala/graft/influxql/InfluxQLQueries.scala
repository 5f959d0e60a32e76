package graft.influxql

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** InfluxDB 1.x's task-manager surface (`SHOW QUERIES` / `KILL QUERY`),
  * re-expressed on Spark's own cancellation machinery: every tracked query
  * executes under a unique job group with `interruptOnCancel = true`, so
  * `KILL QUERY <qid>` maps to `SparkContext.cancelJobGroupAndFutureJobs` — the cancel
  * reaches running executor TASKS as thread interrupts, not just a
  * driver-side flag, which is exactly what an admin killing a runaway
  * dashboard scan needs.
  *
  * The registry itself is driver-local state sized by concurrent HTTP
  * callers (panel-count, not data), so a ConcurrentHashMap is the right
  * scale; nothing here touches executors except the cancel signal.
  */
object InfluxQLQueries {

  final case class Running(qid: Long, query: String, db: String,
      startNs: Long, jobGroup: String)

  private val seq = new AtomicLong(0)
  private val running = new ConcurrentHashMap[Long, Running]

  /** Snapshot for SHOW QUERIES, oldest (lowest qid) first. */
  def list(): Seq[Running] = {
    import scala.jdk.CollectionConverters._
    running.values.asScala.toSeq.sortBy(_.qid)
  }

  /** Run `body` registered under its own interruptible job group. The job
    * group is a THREAD-LOCAL Spark property on the calling thread (the
    * HTTP worker running this request), so concurrent requests don't stomp
    * each other's groups; it is cleared on the way out so pooled threads
    * never leak a stale group into the next request.
    */
  def track[A](spark: SparkSession, query: String, db: String,
      clockNs: () => Long)(body: => A): A = {
    val qid = seq.incrementAndGet()
    val group = s"influxql-query-$qid"
    val sc = spark.sparkContext
    sc.setJobGroup(group, s"influxql qid=$qid: $query", interruptOnCancel = true)
    running.put(qid, Running(qid, query, db, clockNs(), group))
    try body
    finally { running.remove(qid); sc.clearJobGroup() }
  }

  /** KILL QUERY <qid>. Unknown or already-finished qids error with
    * InfluxDB's "no such query id" shape. The registry entry is removed by
    * the tracked body's own unwind (its collect throws once the group's
    * jobs cancel) — mirroring InfluxDB, where a killed query leaves SHOW
    * QUERIES when it actually stops, not when the kill is issued.
    *
    * Cancels future jobs too, not just active ones: a statement is often
    * MANY Spark jobs (chunked export, multi-statement render), and a kill
    * landing in the gap between two of them — or before the first is even
    * submitted — must still stop the query. Job groups are unique per qid
    * and never reused, so poisoning the group's future can't hit
    * unrelated work.
    */
  def kill(spark: SparkSession, qid: Long): Unit = {
    val r = running.get(qid)
    if (r == null)
      throw InfluxQLAst.InfluxQLParseException(s"no such query id: $qid")
    spark.sparkContext.cancelJobGroupAndFutureJobs(r.jobGroup, s"KILL QUERY $qid")
  }

  /** SHOW QUERIES' duration column, InfluxDB-style coarse units. */
  def durationStr(ns: Long): String =
    if (ns >= 1000000000L) s"${ns / 1000000000L}s"
    else if (ns >= 1000000L) s"${ns / 1000000L}ms"
    else s"${ns / 1000L}µs"
}
