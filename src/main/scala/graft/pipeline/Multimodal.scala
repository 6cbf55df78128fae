package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery — schema, partition-sized batching, typed
  * Dataset mapPartitions (the Scala analogue of `mapInPandas`: one
  * iterator per partition, vectorizable) — is real and tested. The
  * codec itself is STUBBED: this container has no image/audio
  * libraries, so `decodeStub` produces deterministic byte-level
  * pseudo-features. In a real deployment, replace `decodeStub`'s body
  * with the actual codec call (JNI/javacpp ffmpeg, ImageIO, …); every
  * other line stays.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String,            // "image" | "audio" | "video"
      content: Array[Byte],
      source: String)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      source: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])        // decoded feature vector (stubbed)

  /** STUB — stands in for the real decoder. Deterministic byte-moment
    * "features" keep the full pipeline testable end-to-end. */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? real codec goes here (resize / spectrogram / frame-sample)
    val out = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  def checksum(content: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) { h = 31 * h + content(i); i += 1 }
    h
  }

  /** Per-partition batch feature extraction. Partitions stream through
    * the decoder one record at a time with constant memory; at cluster
    * scale, repartition upstream by size so a partition's payload fits
    * the executor (see `repartitionBySize`). */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.source,
          r.content.length, checksum(r.content), decodeStub(r.content, dim))
      }
    }
  }

  /** Frame-sample a video-ish payload into `n` evenly spaced chunks
    * (stub for keyframe extraction — chunking/batch shape is the point). */
  def frameSample(content: Array[Byte], n: Int, frameBytes: Int): Seq[Array[Byte]] = {
    if (content.isEmpty || n <= 0) Seq.empty
    else {
      val step = math.max(content.length / n, 1)
      (0 until math.min(n, content.length)).map { i =>
        content.slice(i * step, math.min(i * step + frameBytes, content.length))
      }
    }
  }

  /** Spread media rows so each partition holds ≈ `targetBytes` of
    * payload — the knob that keeps decode batches executor-sized at
    * 100 TB (range-partition on a running size key would be exact; a
    * hash on id is sufficient and shuffle-cheap). */
  def repartitionBySize(df: DataFrame, byteCol: String, targetBytes: Long): DataFrame = {
    val total = df.agg(sum(col(byteCol))).head().getLong(0)
    val parts = math.max((total / targetBytes).toInt, 1)
    df.repartition(parts)
  }

  /** Build a media table from the documents corpus (text bytes as the
    * opaque payload) — the fixture used by tests and queries. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"),
      col("source"))
      .as[MediaRecord]
  }
}
