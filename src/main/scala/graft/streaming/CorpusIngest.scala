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
}
