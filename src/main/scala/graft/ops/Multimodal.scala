package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * payloads with typed metadata; decode / feature-extraction runs
  * partition-parallel over the binary column.
  *
  * The actual media codecs are NOT in this container, so the decode step is
  * a clearly-marked deterministic STUB — but the Spark-side contract
  * (schema, encoders, partition-level batch shape, checksum) is real and
  * tested, and the stub body is the single place a real codec would slot in.
  */
object Multimodal {

  case class MediaFeature(doc_id: Long, n_bytes: Long, format: String,
                          checksum: String, feature: Array[Float])

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
    * ???-equivalent STUB: a real implementation would decode the media here
    * (e.g. JPEG → pixels → model features); this derives a deterministic
    * pseudo-feature from the bytes so the distributed plumbing is testable.
    * One task per partition, rows streamed — no per-row JVM setup cost; a
    * codec handle would be opened once per partition in the mapPartitions
    * closure (exactly where a JNI/ONNX session would live).
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
          // [STUB decode] deterministic rolling projection of the bytes:
          val feature = Array.tabulate(dim) { i =>
            var acc = i.toLong
            var j = 0
            while (j < bytes.length) {
              acc = (acc * 31 + (bytes(j) & 0xff)) % 1000003L
              j += 1
            }
            (acc.toDouble / 1000003.0).toFloat
          }
          MediaFeature(id, bytes.length.toLong, fmt, checksum, feature)
        }
      }
  }
}
