package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, struct}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** T8 — ingest monitoring. The reference's consumer heartbeat
  * (brokerconsumer.py:704-722: periodic documents with message counts
  * and timestamps) maps onto Structured Streaming's progress-event bus:
  * a [[StreamingQueryListener]] appends one JSON line per micro-batch
  * progress (Spark's own progress JSON carries batchId, numInputRows,
  * durations, and per-source offsets — a superset of the reference's
  * heartbeat fields) plus start/termination lifecycle lines. JSONL via
  * local appends keeps the listener off the Spark execution path — a
  * heartbeat that launches jobs can deadlock the very stream it
  * monitors. */
final class HeartbeatListener(logDir: String) extends StreamingQueryListener {

  private def append(name: String, line: String): Unit = synchronized {
    Files.createDirectories(Paths.get(logDir))
    Files.write(Paths.get(logDir, name),
      (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** JSON string literal with full escaping — exception text carries
    * multi-line stack traces and backslashed paths, and one raw
    * newline breaks the line-per-object contract of the log. */
  private def jstr(s: String): String =
    if (s == null) "null"
    else s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }.mkString("\"", "", "\"")

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    append("lifecycle.jsonl",
      s"""{"event":"started","id":"${event.id}","runId":"${event.runId}","name":${
        jstr(event.name)},"timestamp":${jstr(event.timestamp)}}""")

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    append("progress.jsonl", event.progress.json)

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    append("lifecycle.jsonl",
      s"""{"event":"terminated","id":"${event.id}","runId":"${event.runId}","exception":${
        event.exception.map(jstr).getOrElse("null")}}""")
}

object Monitoring {

  def attach(spark: SparkSession, logDir: String): HeartbeatListener = {
    val l = new HeartbeatListener(logDir)
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: HeartbeatListener): Unit =
    spark.streams.removeListener(l)

  /** The heartbeat log as a queryable table. Empty (correct schema, no
    * rows) before the first progress line lands — the listener bus is
    * async, so a poller may ask before batch 1 reports; that must read
    * as "zero batches", not a PATH_NOT_FOUND crash. */
  def progress(spark: SparkSession, logDir: String): DataFrame = {
    val p = Paths.get(logDir, "progress.jsonl")
    if (!java.nio.file.Files.exists(p))
      spark.range(0).select(
        lit("").as("runId"), lit(0L).as("batchId"),
        lit(0L).as("numInputRows"),
        struct(lit(0L).as("triggerExecution")).as("durationMs"))
    else spark.read.json(p.toString)
  }

  /** Per-run rollup: batches, rows, mean batch duration — the
    * "how is ingest doing" heartbeat summary. */
  def summary(spark: SparkSession, logDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    progress(spark, logDir)
      .groupBy(col("runId"))
      .agg(count(lit(1)).as("n_batches"),
        sum("numInputRows").as("rows"),
        avg(col("durationMs.triggerExecution")).as("avg_trigger_ms"),
        max("batchId").as("last_batch"))
  }
}
