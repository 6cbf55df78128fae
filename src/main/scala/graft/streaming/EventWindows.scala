package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Watermarked tumbling-window aggregation over an event stream.
  *
  * The reference's only "window" is a recency predicate (T6), which
  * [[graft.query.Ltcv.hotLtcvs]] covers; this adds the standard
  * Structured-Streaming shape (event-time watermark + tumbling window +
  * append output) that a monitoring/alert-rate pipeline at scale needs
  * (alerts/sec per band dashboards, broker-lag tracking). State is
  * bounded by the watermark; output is append-only once windows close.
  */
object EventWindows {

  /** Per-(window, keyCol) counts — plus a sum over `valueCol` when the
    * frame has one to sum (hardcoding "value" made every frame without
    * that column fail analysis) — with a `lateness` watermark over
    * `tsCol`. Works on a streaming OR batch frame (same plan — Spark
    * unifies them). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "5 minutes", lateness: String = "10 minutes",
      valueCol: Option[String] = Some("value")): DataFrame = {
    val sums = valueCol.filter(events.columns.contains)
      .map(c => sum(col(c)).as("sum_value")).toSeq
    val outCols = Seq(col("window.start").as("window_start"),
      col("window.end").as("window_end"), col(keyCol), col("n")) ++
      sums.map(_ => col("sum_value"))
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(outCols: _*)
  }

  /** Per-(session, keyCol) counts with watermarked event-time session
    * windows: a session extends while consecutive events arrive within
    * `gap` (strictly less; an exactly-`gap` pause closes it — Spark's
    * `session_window` merge rule). The streaming analogue of
    * [[graft.query.Temporal.sessionize]]: same per-key sessions, but
    * computed incrementally with state bounded by the watermark — open
    * sessions older than `lateness` finalize and emit, so a 100 TB/day
    * stream holds state only for currently-live sessions, never the
    * corpus. Works on a streaming OR batch frame (identical plan
    * semantics, which is what the spec's stream-vs-batch check pins). */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** Run as a file-source stream into an in-memory sink (tests /
    * local monitoring); production would writeStream to a gold table. */
  def runFileStream(spark: SparkSession, inputDir: String,
      schema: org.apache.spark.sql.types.StructType,
      tsCol: String, keyCol: String, queryName: String,
      checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    windowedCounts(stream, tsCol, keyCol)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .start()
  }
}
