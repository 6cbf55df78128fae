package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** The bronze→silver hop for a TEXT corpus arriving as a stream — the
  * corpus counterpart of the alert stream's wrangle step: exact dedup
  * at ingest ([[StreamingDedup]], state crosses micro-batches), then
  * the per-row quality surface as codegen'd column expressions on the
  * deduped stream.
  *
  * Because every scoring primitive is a pure column expression (no
  * UDF, no state), batch and streaming share this one definition —
  * the unified-API contract: run it on a bounded Dataset and it is
  * exactly the batch pipeline; run it on a readStream and the same
  * plan incrementalizes. StreamingSpec asserts both agree.
  */
object CorpusIngest {

  /** Deduped + scored corpus rows; append-mode streamable. */
  def scored(docs: Dataset[StreamingDedup.Doc]): DataFrame =
    StreamingDedup.dedupStream(docs).toDF()
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("fingerprint", TextAnalysis.fingerprint(col("text")))
      .withColumn("export_text", TextAnalysis.redactPii(col("text")))

  /** Ingest telemetry: per-(event-time window, predicted language)
    * corpus health — doc/token throughput, mean quality, approximate
    * distinct fingerprints — the dashboard that catches a crawl
    * feeding garbage (quality drop), a stuck dedup (distinct-ratio
    * drop), or a language-mix shift WHILE the corpus streams in,
    * rather than at the next batch audit.
    *
    * `docs` needs `text` + an event-time `tsCol` (crawl/arrival time).
    * All scoring is codegen'd column expressions in the scan stage;
    * the only state is the watermark-bounded window aggregate, and
    * `approx_count_distinct` (HyperLogLog++) keeps the per-window
    * state O(1) where exact COUNT(DISTINCT) would buffer every
    * fingerprint — on a 100 TB/day stream that difference is the
    * operator. Batch and streaming share the definition (the
    * unified-API contract: StreamingSpec pins that a file-streamed run
    * emits exactly the batch rollup for every closed window). */
  def windowedStats(docs: DataFrame, tsCol: String,
      window_ : String = "5 minutes", lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        avg("quality").as("avg_quality"),
        approx_count_distinct("fp").as("n_approx_distinct"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("lang_pred"),
        col("n_docs"), col("n_tokens"), col("avg_quality"),
        col("n_approx_distinct"))
}
