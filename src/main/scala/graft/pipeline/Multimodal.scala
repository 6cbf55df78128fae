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
  * dependencies. AUDIO decode is REAL for PCM WAV/AIFF/AU:
  * `javax.sound.sampled` also ships with the JRE
  * ([[audioStats]]/[[decodeAudio]]). VIDEO is a frame container split
  * ([[splitPngFrames]]) + real per-frame ImageIO decode
  * ([[decodeVideo]]); only the container demux is a fixture stand-in
  * (no ffmpeg in this container) — swap that one function for the
  * ffmpeg demuxer in a real deployment. [[decodeStub]] remains solely
  * as the fallback for undecodable payloads and exotic formats.
  */
object Multimodal {

  // ImageIO wraps every read/write stream in a FileCacheImageInputStream
  // by default — a temp FILE per call. Decoding millions of in-memory
  // payloads must not touch disk; the memory-backed cache is exact-same
  // behavior minus the I/O. (JVM-global, set when the first decode task
  // classloads this object on an executor.)
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Deterministic RGB PNG fixture: `pixel(x, y, c) = (x + 2y + id +
    * 7·frame + 5c) mod 256` over a `(8 + id mod 9) × (8 + id mod 7)`
    * canvas — closed form a SQL oracle can regenerate, real bytes for
    * the ImageIO round-trip. `frame` varies the content for multi-frame
    * (video) fixtures. */
  def syntheticPng(id: Long, frame: Int = 0): Array[Byte] = {
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
          raster.setSample(x, y, c,
            ((x + 2L * y + id + 7L * frame + 5L * c) % 256).toInt)
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

  // ---- video: frame container + real per-frame decode --------------

  private val PngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** A deterministic "video": `n` PNG frames concatenated back to back
    * (a trivial container — the per-frame decode is the real part). */
  def syntheticVideo(id: Long, nFrames: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) { bos.write(syntheticPng(id, f)); f += 1 }
    bos.toByteArray
  }

  /** Split a concatenated-PNG container into frames by scanning for
    * the 8-byte PNG signature. An 8-byte magic inside compressed frame
    * data is a ~n/2⁶⁴ coincidence — acceptable for a fixture
    * container; a real deployment swaps this one function for the
    * ffmpeg demuxer and keeps everything downstream. */
  def splitPngFrames(content: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i <= content.length - PngMagic.length) {
      if (content(i) == PngMagic(0) && {
        var j = 1
        while (j < PngMagic.length && content(i + j) == PngMagic(j)) j += 1
        j == PngMagic.length
      }) { starts += i; i += PngMagic.length }
      else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (s, k) =>
      val end = if (k + 1 < starts.length) starts(k + 1) else content.length
      java.util.Arrays.copyOfRange(content, s, end)
    }
  }

  /** Video feature vector: decode every frame with ImageIO and average
    * the per-frame image features. None when the payload contains no
    * decodable frames. */
  def decodeVideo(content: Array[Byte], dim: Int): Option[Array[Float]] = {
    val frames = splitPngFrames(content).flatMap(decodeImage(_, dim))
    if (frames.isEmpty) None
    else {
      val out = new Array[Float](dim)
      frames.foreach { f =>
        var i = 0
        while (i < dim) { out(i) += f(i) / frames.length; i += 1 }
      }
      Some(out)
    }
  }

  // ---- audio: real WAV decode via javax.sound.sampled --------------

  /** Exact per-clip statistics from a real WAV decode: like
    * [[ImageStats]], integer sample sums are exact so a decode query
    * can hash-match a SQL oracle. */
  final case class AudioStats(
      channels: Int, sampleRate: Int, nFrames: Long,
      sums: Array[Long],                 // per-channel Σ sample
      sumSquares: Array[Double])         // per-channel Σ sample²

  /** Decode an audio payload with the JRE's `javax.sound.sampled`
    * (WAV/AIFF/AU PCM readers ship with the JDK — no external codec).
    * Supports 16-bit signed PCM, the canonical interchange format;
    * returns None for anything else — callers fall back to the stub. */
  def audioStats(content: Array[Byte]): Option[AudioStats] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val ch = fmt.getChannels
        val bigEndian = fmt.isBigEndian
        val sums = new Array[Long](ch)
        val sqs = new Array[Double](ch)
        val buf = new Array[Byte](4096 * ch * 2)
        var nFrames = 0L
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 2 * ch <= read) {
            var c = 0
            while (c < ch) {
              val lo = buf(i + 2 * c + (if (bigEndian) 1 else 0)) & 0xFF
              val hi = buf(i + 2 * c + (if (bigEndian) 0 else 1))
              val v = (hi << 8) | lo
              sums(c) += v
              sqs(c) += v.toDouble * v
              c += 1
            }
            nFrames += 1
            i += 2 * ch
          }
          read = ais.read(buf)
        }
        Some(AudioStats(ch, fmt.getSampleRate.toInt, nFrames, sums, sqs))
      }
    } catch { case _: Exception => None }

  /** Perceptual audio fingerprint — the audio counterpart of
    * [[aHashBits]]: the PCM stream folds into 64 time bins by
    * bin(i) = ⌊i·64/n⌋; per bin, e = Σ(channel-sum)², c = frame count,
    * t = ⌊e·64/c⌋; bit j set iff 64·t_j > Σt (strict). Exact-integer
    * throughout, so the 64-char fingerprint replays from sample values
    * on any engine; loudness structure (where the energy sits in time)
    * is what it keys on. Buffers one Long per frame (a minute of 48 kHz
    * is ~23 MB transient per row — repartition by size upstream for
    * long files, as [[extractFeatures]] documents). None for payloads
    * the PCM reader rejects. */
  def audioFingerprint(content: Array[Byte]): Option[String] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val ch = fmt.getChannels
        val bigEndian = fmt.isBigEndian
        val frames = scala.collection.mutable.ArrayBuffer.empty[Long]
        val buf = new Array[Byte](4096 * ch * 2)
        var read = ais.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 2 * ch <= read) {
            var c = 0
            var v = 0L
            while (c < ch) {
              val lo = buf(i + 2 * c + (if (bigEndian) 1 else 0)) & 0xFF
              val hi = buf(i + 2 * c + (if (bigEndian) 0 else 1))
              v += (hi << 8) | lo
              c += 1
            }
            frames += v
            i += 2 * ch
          }
          read = ais.read(buf)
        }
        val n = frames.length
        if (n == 0) None
        else {
          val e = new Array[Long](64)
          val c = new Array[Long](64)
          var i = 0
          while (i < n) {
            val j = (i.toLong * 64 / n).toInt
            val v = frames(i)
            e(j) += v * v
            c(j) += 1
            i += 1
          }
          val t = Array.tabulate(64)(j => if (c(j) == 0) 0L else e(j) * 64L / c(j))
          val total = t.sum
          val sb = new java.lang.StringBuilder(64)
          var j = 0
          while (j < 64) {
            sb.append(if (64L * t(j) > total) '1' else '0')
            j += 1
          }
          Some(sb.toString)
        }
      }
    } catch { case _: Exception => None }

  /** Audio feature vector from a real decode:
    * `[channels, sampleRate, nFrames, mean_c…, std_c…]` truncated or
    * zero-padded to `dim`. */
  def decodeAudio(content: Array[Byte], dim: Int): Option[Array[Float]] =
    audioStats(content).map { st =>
      val n = math.max(st.nFrames, 1L).toDouble
      val out = new Array[Float](dim)
      if (dim > 0) out(0) = st.channels.toFloat
      if (dim > 1) out(1) = st.sampleRate.toFloat
      if (dim > 2) out(2) = st.nFrames.toFloat
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

  /** Deterministic 16-bit mono PCM WAV fixture:
    * `sample(i) = ((i·k) mod 65536) − 32768` with `k = id mod 251 + 3`
    * over `200 + id mod 100` samples at 8 kHz — closed form for the
    * oracle, a real RIFF container for the AudioSystem round-trip. */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = 200 + (id % 100).toInt
    val k = (id % 251) + 3
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(8000)                      // sample rate
      .putInt(8000 * 2)                  // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((i * k) % 65536) - 32768).toShort)
      i += 1
    }
    bb.array()
  }

  /** A media row: opaque payload + typed metadata. */
  /** Perceptual average-hash of an image — the image-side counterpart
    * of the text SimHash: near-identical images (small brightness
    * shifts, re-encodes) land at small Hamming distance, so the
    * SimHash-style block-index join machinery (d3/d10) does image
    * near-dup at corpus scale on 64-bit keys instead of pixels.
    *
    * Definition is EXACT-INTEGER so the hash replays on any engine
    * from pixel values alone (no float summation-order hazards):
    * pixels fold into an 8×8 grid by bin(i) = ⌊x·8/w⌋; per bin,
    * s = Σ(channel-sum), c = pixel count, t = ⌊s·64/c⌋; bit k set iff
    * 64·t_k > Σ_j t_j (strict — a bin exactly at the mean is 0).
    * Returned as a 64-char '0'/'1' string, bit index bi·8+bj, so no
    * sign-bit overflow and direct substring diffing. None for
    * undecodable payloads; bins that receive no pixels (image narrower
    * than 8) contribute t = 0. */
  def aHashBits(content: Array[Byte]): Option[String] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val nch = raster.getNumBands
        val s = new Array[Long](64)
        val c = new Array[Long](64)
        val rowBuf = new Array[Int](w)
        var ch = 0
        while (ch < nch) {
          var y = 0
          while (y < h) {
            val bj = y * 8 / h
            raster.getSamples(0, y, w, 1, ch, rowBuf)
            var x = 0
            while (x < w) {
              val k = (x * 8 / w) * 8 + bj
              s(k) += rowBuf(x)
              if (ch == 0) c(k) += 1
              x += 1
            }
            y += 1
          }
          ch += 1
        }
        val t = Array.tabulate(64)(k => if (c(k) == 0) 0L else s(k) * 64L / c(k))
        val total = t.sum
        val sb = new java.lang.StringBuilder(64)
        var k = 0
        while (k < 64) {
          sb.append(if (64L * t(k) > total) '1' else '0')
          k += 1
        }
        Some(sb.toString)
      }
    } catch { case _: Exception => None }

  /** Difference hash (dHash): the gradient companion to [[aHashBits]]
    * — a 9×8 grid of block luminance means, bit k = 1 iff the mean
    * INCREASES from column bx to bx+1 in row by (k = by·8 + bx).
    * Robust to global brightness/contrast shifts that move every
    * block mean together (aHash's failure mode). Exact-integer: the
    * mean comparison s₁/c₁ < s₂/c₂ is evaluated as s₁·c₂ < s₂·c₁
    * (counts positive), so no division, no rounding — the DuckDB
    * pixel replay produces the identical 64-bit string. An empty
    * 9th column (w < 9) compares as zero on both sides. */
  def dHashBits(content: Array[Byte]): Option[String] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val nch = raster.getNumBands
        val s = new Array[Long](72)   // 9 cols × 8 rows, idx = bx*8 + by
        val c = new Array[Long](72)
        val rowBuf = new Array[Int](w)
        var ch = 0
        while (ch < nch) {
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            raster.getSamples(0, y, w, 1, ch, rowBuf)
            var x = 0
            while (x < w) {
              val k = (x * 9 / w) * 8 + by
              s(k) += rowBuf(x)
              if (ch == 0) c(k) += 1
              x += 1
            }
            y += 1
          }
          ch += 1
        }
        val sb = new java.lang.StringBuilder(64)
        var by = 0
        while (by < 8) {
          var bx = 0
          while (bx < 8) {
            val l = bx * 8 + by
            val r = (bx + 1) * 8 + by
            sb.append(if (s(l) * c(r) < s(r) * c(l)) '1' else '0')
            bx += 1
          }
          by += 1
        }
        Some(sb.toString)
      }
    } catch { case _: Exception => None }

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
      payload_md5: String,           // content fingerprint (hex) — the dedup/cache key
      features: Array[Float])        // decoded features (real codecs; stub only for unknown formats)

  /** STUB — the fallback for payloads no real decoder accepts
    * (compressed audio, real video containers, garbage). Deterministic
    * byte-moment "features" keep the full pipeline testable end-to-end.
    * (Images/WAV/PNG-frame video do NOT go through this: see
    * [[decodeImage]]/[[decodeAudio]]/[[decodeVideo]].) */
  def decodeStub(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? exotic-codec call goes here (mp3/mp4 spectrogram, ffmpeg)
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
    * the executor (see `repartitionBySize`). Image, audio, and video
    * rows all go through their REAL decoders (ImageIO, javax.sound,
    * PNG-frame demux); only payloads those decoders reject — exotic
    * codecs, garbage — fall back to the stub. */
  def extractFeatures(ds: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // one digest per partition, reset by each digest() call — MD5 as
      // the content fingerprint because it is the engine-portable
      // spelling (DuckDB/Postgres/Spark all emit the same lowercase
      // hex), which is what lets a binary column participate in a
      // cross-engine hash oracle without shipping the payload
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val decoded = r.media_type match {
          case "image" => decodeImage(r.content, dim)
          case "audio" => decodeAudio(r.content, dim)
          case "video" => decodeVideo(r.content, dim)
          case _ => None
        }
        val hex = md.digest(r.content).map(b => f"$b%02x").mkString
        MediaFeatures(r.media_id, r.media_type, r.source,
          r.content.length, checksum(r.content), hex,
          decoded.getOrElse(decodeStub(r.content, dim)))
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
    // sum() over zero rows is null — an empty media table passes
    // through unchanged instead of NPE-ing on getLong
    val r = df.agg(sum(col(byteCol))).head()
    val total = if (r.isNullAt(0)) 0L else r.getLong(0)
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
