package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * payloads with typed metadata; decode / feature-extraction runs
  * partition-parallel over the binary column.
  *
  * IMAGE decode is REAL: `image/…` payloads go through the JDK's
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers ship with the JDK — zero new
  * dependencies, headless-safe), yielding true width/height/channels and
  * per-channel pixel-mean features. AUDIO decode is REAL for the JDK's
  * container formats (WAV/AIFF/AU, PCM 8/16-bit via
  * `javax.sound.sampled`): true frame count, sample rate, channels, and
  * per-channel mean-amplitude features. Video codecs (and compressed
  * audio) are NOT in this container, so those payloads take the
  * clearly-marked deterministic STUB path — the Spark-side contract
  * (schema, encoders, partition-level batch shape, checksum) is identical
  * for all paths, and the stub body is the single place a real codec
  * would slot in.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, n_bytes: Long, format: String,
                          checksum: String, decoded: Boolean,
                          width: Int, height: Int, channels: Int,
                          feature: Array[Float])

  /** JDK image decode; None when the payload is not a decodable image (the
    * reader returns null / throws on corrupt bytes — both map to the stub
    * path, never a task failure).
    */
  private[ops] def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  private[ops] case class AudioInfo(frames: Long, sampleRate: Int,
                                    channels: Int, meanAbs: Array[Double])

  /** JDK audio decode (javax.sound.sampled ships WAV/AIFF/AU parsers —
    * zero new dependencies): PCM 8/16-bit payloads yield true frame count,
    * sample rate, channel count, and per-channel mean absolute amplitude
    * in [0,1]. Compressed encodings (no codecs offline) and corrupt bytes
    * return None — the stub path, never a task failure.
    */
  private[ops] def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        import javax.sound.sampled.AudioFormat.Encoding
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val pcmOk =
          (fmt.getEncoding == Encoding.PCM_SIGNED && (bits == 16 || bits == 8)) ||
          (fmt.getEncoding == Encoding.PCM_UNSIGNED && bits == 8)
        if (!pcmOk || fmt.getFrameSize <= 0) None
        else {
          val ch = fmt.getChannels
          val bytesPerSample = bits / 8
          val frameBytes = fmt.getFrameSize
          val data = in.readAllBytes()
          val frames = data.length.toLong / frameBytes
          // stride-sample ≤ 65536 probe frames so an hour-long payload
          // cannot pin an executor core (same cap idea as the image path)
          val step = math.max(1L, frames / 65536L).toInt
          val sums = new Array[Double](ch)
          var f = 0L
          var n = 0L
          while (f < frames) {
            val base = (f * frameBytes).toInt
            var c = 0
            while (c < ch) {
              val off = base + c * bytesPerSample
              val v =
                if (bits == 16) {
                  val s =
                    if (fmt.isBigEndian)
                      ((data(off) << 8) | (data(off + 1) & 0xff)).toShort
                    else
                      ((data(off + 1) << 8) | (data(off) & 0xff)).toShort
                  s / 32768.0
                } else if (fmt.getEncoding == Encoding.PCM_SIGNED)
                  data(off) / 128.0
                else ((data(off) & 0xff) - 128) / 128.0
              sums(c) += math.abs(v)
              c += 1
            }
            n += 1
            f += step
          }
          Some(AudioInfo(frames, fmt.getSampleRate.toInt, ch,
            sums.map(_ / math.max(1L, n))))
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Wrap a text corpus as binary payloads + typed metadata — the shape a
    * real media table would have (payload from object storage, metadata from
    * the catalog).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("format"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"),
        lit(3).as("channels")).as("media_meta"))

  /** Frame sampling over a binary payload: fixed-size windows every `stride`
    * bytes (the video/audio frame-extraction shape — here over opaque bytes;
    * a real codec would seek keyframes instead). Pure codegen expressions:
    * `substring` operates directly on BinaryType.
    */
  def frameSample(df: DataFrame, payloadCol: String, frameSize: Int,
                  stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    val n = octet_length(col(payloadCol))
    val nFrames = when(n >= frameSize,
      floor((n - frameSize).cast("double") / stride).cast("long") + 1L)
      .otherwise(0L)
    df.withColumn("n_frames", nFrames)
      .withColumn("frames",
        when(col("n_frames") > 0,
          transform(sequence(lit(0L), col("n_frames") - 1),
            i => col(payloadCol).substr((i * stride).cast("int") + 1, lit(frameSize))))
          .otherwise(array().cast("array<binary>")))
  }

  /** Resize stub: decimate a binary payload to ~`targetBytes` by keeping
    * every k-th byte (k = ceil(n/target)) — the byte-domain stand-in for an
    * image resize (a real implementation decodes, resamples pixels, and
    * re-encodes inside this same mapPartitions seam). Deterministic,
    * partition-parallel, output length ≤ targetBytes.
    */
  final case class ResizedPayload(doc_id: Long, n_bytes_in: Long,
                                  n_bytes_out: Long, payload: Array[Byte])

  def resize(spark: SparkSession, withPayload: DataFrame,
             targetBytes: Int): Dataset[ResizedPayload] = {
    import spark.implicits._
    require(targetBytes > 0)
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // [STUB decode/resample/encode]
          val k = math.max(1, math.ceil(bytes.length.toDouble / targetBytes).toInt)
          val out = bytes.indices.collect { case i if i % k == 0 => bytes(i) }.toArray
          ResizedPayload(id, bytes.length.toLong, out.length.toLong, out)
        }
      }
  }

  /** Partition-parallel feature extraction over the binary payload.
    *
    * `image/…` formats DECODE FOR REAL (javax.imageio): width/height/
    * channels come from the decoded raster and the feature vector is the
    * per-channel pixel mean in [0,1] (ARGB-normalized, so the values are
    * independent of the on-disk band layout), stride-sampled to ≤ 256×256
    * probe points so a pathological 100-megapixel payload cannot pin an
    * executor core. Anything else — and any image the reader rejects —
    * takes the deterministic STUB projection of the raw bytes
    * (`decoded=false`), where an audio/video codec would slot in. One task
    * per partition, rows streamed; a heavier codec/session handle would be
    * opened once per partition in this same mapPartitions closure.
    */
  def extractFeatures(spark: SparkSession, withPayload: DataFrame,
                      dim: Int = 8): Dataset[MediaFeature] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"), col("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition setup would go here (decoder/session init)
        rows.map { case (id, bytes, fmt) =>
          val checksum = java.security.MessageDigest.getInstance("SHA-256")
            .digest(bytes).map("%02x".format(_)).mkString
          val decodedImage: Option[MediaFeature] =
            (if (fmt.startsWith("image/")) decodeImage(bytes) else None).map { im =>
              val w = im.getWidth
              val h = im.getHeight
              val ch = im.getColorModel.getNumComponents
              val stepX = math.max(1, w / 256)
              val stepY = math.max(1, h / 256)
              val sums = new Array[Double](4) // r, g, b, a from packed ARGB
              var n = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y)
                  sums(0) += (rgb >>> 16) & 0xff
                  sums(1) += (rgb >>> 8) & 0xff
                  sums(2) += rgb & 0xff
                  sums(3) += (rgb >>> 24) & 0xff
                  n += 1
                  x += stepX
                }
                y += stepY
              }
              val feature = Array.tabulate(dim)(i =>
                if (i < sums.length) (sums(i) / (n * 255.0)).toFloat else 0f)
              MediaFeature(id, bytes.length.toLong, fmt, checksum,
                decoded = true, w, h, ch, feature)
            }
          // audio geometry reuses the modality-agnostic columns: width
          // carries the frame count (clamped to Int), height the sample
          // rate — documented here rather than widening the schema per
          // modality
          val decodedAudio: Option[MediaFeature] =
            (if (fmt.startsWith("audio/")) decodeAudio(bytes) else None).map { a =>
              val feature = Array.tabulate(dim)(i =>
                if (i < a.meanAbs.length) a.meanAbs(i).toFloat else 0f)
              MediaFeature(id, bytes.length.toLong, fmt, checksum,
                decoded = true,
                width = math.min(a.frames, Int.MaxValue.toLong).toInt,
                height = a.sampleRate, channels = a.channels, feature)
            }
          decodedImage.orElse(decodedAudio).getOrElse {
            // [STUB decode] deterministic rolling projection of the bytes:
            // video (and any payload the JDK readers reject) lands here —
            // no codecs offline; this body is where a real codec slots in
            val feature = Array.tabulate(dim) { i =>
              var acc = i.toLong
              var j = 0
              while (j < bytes.length) {
                acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L
                j += 1
              }
              (acc.toDouble / 1000003.0).toFloat
            }
            MediaFeature(id, bytes.length.toLong, fmt, checksum,
              decoded = false, width = -1, height = -1, channels = -1, feature)
          }
        }
      }
  }
}
