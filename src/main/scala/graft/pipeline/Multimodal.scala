package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side machinery — schema, partition-sized batching, typed
  * Dataset mapPartitions (the Scala analogue of `mapInPandas`: one
  * iterator per partition, vectorizable) — is real and tested.
  *
  * IMAGE decode is REAL: JDK ImageIO ships PNG/JPEG/BMP/GIF readers in
  * the JRE, so [[imageStats]]/[[decodeImage]] decode actual pixels
  * (dims, channel count, per-channel moments) with zero external
  * dependencies. Audio/video decode remains STUBBED ([[decodeStub]] —
  * no ffmpeg in this container); in a real deployment replace that one
  * body with the codec call (JNI/javacpp ffmpeg, …); every other line
  * stays.
  */
object Multimodal {

  /** Exact per-image statistics from a real ImageIO decode: integer
    * channel sums are EXACT (no float accumulation), which is what
    * lets a decode query hash-match a SQL oracle bit-for-bit. */
  final case class ImageStats(
      width: Int, height: Int, channels: Int,
      sums: Array[Long],                 // per-channel Σ sample
      sumSquares: Array[Double])         // per-channel Σ sample² (exact ≤ 2⁵³)

  /** Decode an image payload with JDK ImageIO. Returns None when no
    * installed reader recognises the bytes (audio/video/garbage) —
    * callers fall back to [[decodeStub]]. Streams the raster
    * row-by-row; memory is O(width·bands). */
  def imageStats(content: Array[Byte]): Option[ImageStats] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val nch = raster.getNumBands
        val sums = new Array[Long](nch)
        val sqs = new Array[Double](nch)
        val rowBuf = new Array[Int](w)
        var c = 0
        while (c < nch) {
          var y = 0
          while (y < h) {
            raster.getSamples(0, y, w, 1, c, rowBuf)
            var x = 0
            while (x < w) {
              val v = rowBuf(x)
              sums(c) += v
              sqs(c) += v.toDouble * v
              x += 1
            }
            y += 1
          }
          c += 1
        }
        Some(ImageStats(w, h, nch, sums, sqs))
      }
    } catch { case _: Exception => None }

  /** Image feature vector from a real decode:
    * `[width, height, channels, mean_c…, std_c…]` truncated/zero-padded
    * to `dim`. None when the payload is not a decodable image. */
  def decodeImage(content: Array[Byte], dim: Int): Option[Array[Float]] =
    imageStats(content).map { st =>
      val n = (st.width.toLong * st.height).toDouble
      val out = new Array[Float](dim)
      if (dim > 0) out(0) = st.width.toFloat
      if (dim > 1) out(1) = st.height.toFloat
      if (dim > 2) out(2) = st.channels.toFloat
      var c = 0
      while (c < st.channels) {
        val mean = st.sums(c) / n
        if (3 + c < dim) out(3 + c) = mean.toFloat
        if (3 + st.channels + c < dim)
          out(3 + st.channels + c) =
            math.sqrt(math.max(st.sumSquares(c) / n - mean * mean, 0.0)).toFloat
        c += 1
      }
      out
    }

  /** Deterministic RGB PNG fixture: `pixel(x, y, c) = (x + 2y + id + 5c)
    * mod 256` over a `(8 + id mod 9) × (8 + id mod 7)` canvas — closed
    * form a SQL oracle can regenerate, real bytes for the ImageIO
    * round-trip. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          raster.setSample(x, y, c, ((x + 2L * y + id + 5L * c) % 256).toInt)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

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

  /** STUB — stands in for the real audio/video decoder. Deterministic
    * byte-moment "features" keep the full pipeline testable end-to-end.
    * (Images do NOT go through this: see [[decodeImage]].) */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? real a/v codec goes here (spectrogram / frame-sample)
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
    * the executor (see `repartitionBySize`). Image rows go through the
    * real ImageIO decode; anything undecodable (and all audio/video)
    * falls back to the stub. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val feats =
          (if (r.media_type == "image") decodeImage(r.content, dim) else None)
            .getOrElse(decodeStub(r.content, dim))
        MediaFeatures(r.media_id, r.media_type, r.source,
          r.content.length, checksum(r.content), feats)
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
