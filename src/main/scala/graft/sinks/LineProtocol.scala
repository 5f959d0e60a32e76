package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.{Files, Paths}

/** InfluxDB line-protocol sink (SURVEY.md §2.1 S3) — replaces the
  * reference's one-HTTP-POST-per-sample write (Linux/InfluxConnector2.py:176)
  * with batched, per-partition writes.
  *
  * The line format (`measurement field=value timestamp_ns`) is built with
  * codegen'd column functions, so formatting runs distributed; only the
  * final append happens in the sink. `foreachBatch(append(dir))` wires it
  * into Structured Streaming with one writer per micro-batch — connection
  * (here: file handle) reuse amortized across the whole batch, the fix for
  * the reference's per-sample write amplification (BASELINE.md).
  */
object LineProtocol {

  /** Escape a measurement name (line-protocol: commas + spaces). */
  def escapeMeasurement(c: Column): Column =
    regexp_replace(regexp_replace(c, ",", "\\\\,"), " ", "\\\\ ")

  /** One line-protocol line per row: `measurement alias=value tsNs`. */
  def lineCol(measurement: Column, alias: Column, value: Column, tsNs: Column): Column =
    concat(escapeMeasurement(measurement), lit(" "),
      alias, lit("="), format_string("%.2f", value), lit(" "),
      tsNs.cast("string"))

  /** Shape an events-like frame into line-protocol strings. */
  def format(df: DataFrame): DataFrame =
    df.select(col("event_id"),
      lineCol(
        concat(lit("plc-"), col("user_id").cast("string")),
        col("event_type"), col("value"),
        expr("unix_micros(ts) * 1000L")).as("line"))

  /** Shape a point frame (ts, measurement, alias, value) — the decoded PLC
    * sample shape of SURVEY §2.2 P2 — into line-protocol strings.
    */
  def formatPoints(df: DataFrame): DataFrame =
    df.select(
      lineCol(col("measurement"), col("alias"), col("value"),
        expr("unix_micros(ts) * 1000L")).as("line"))

  /** Batch-write a one-column frame of lines to `dir/part-<batchId>.lp`.
    * Stand-in for the InfluxDB HTTP endpoint (zero-egress container); the
    * batching structure — collect per batch, single writer, newline-joined
    * payload — is exactly what an HTTP client would send as one POST body.
    *
    * The write TRUNCATES (append=false): foreachBatch is at-least-once, so
    * a micro-batch replayed after a failure between write and checkpoint
    * commit overwrites its own file instead of duplicating points — the
    * batchId-keyed filename makes the whole sink idempotent.
    */
  def append(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    val lines = batch.select("line").collect().map(_.getString(0))
    if (lines.nonEmpty) {
      val w = new BufferedWriter(new FileWriter(s"$dir/part-$batchId.lp", false))
      try { lines.foreach { l => w.write(l); w.newLine() } }
      finally w.close()
    }
  }
}
