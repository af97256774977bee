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

  // ImageIO defaults to DISK-backed stream caches: every read/write spins
  // up (and deletes) a temp file. All payloads here are in-memory byte
  // arrays, so the cache is pure I/O overhead in the per-row decode hot
  // path — switch the JVM to memory-backed streams once, at first touch
  // of this object (runs on each executor too). Purely a buffering
  // choice; decoded bits are identical.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Byte-domain resize for payloads WITHOUT a JVM decoder (video with
    * inter-frame codecs, unknown formats): decimate to ~`targetBytes` by
    * keeping every k-th byte (k = ceil(n/target)). Images have a REAL
    * pixel-domain resize — [[resizeImages]] — in the same mapPartitions
    * seam. Deterministic, partition-parallel, output length ≤ targetBytes.
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

  // ---- image resize (REAL, stock JVM) -------------------------------------

  final case class ResizedImage(doc_id: Long, width_in: Int, height_in: Int,
                                width_out: Int, height_out: Int,
                                payload: Array[Byte])

  /** A real PNG payload: solid `rgb` (0xRRGGBB) at `width`x`height` —
    * lossless, so pixel values round-trip exactly (unlike [[jpegBytes]]).
    */
  def pngBytes(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one Arrays.fill of the INT_RGB backing buffer instead of w*h
    // setRGB color-model round-trips — same 24-bit pixel values (callers
    // pass 0xRRGGBB with a zero top byte, exactly what setRGB stored)
    java.util.Arrays.fill(im.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** A real PNG with per-pixel gray levels from `gray(x, y)` (0..255;
    * stored as r=g=b) — the patterned sibling of [[pngBytes]] for
    * perceptual-hash tests where a solid color would be degenerate.
    */
  def pngBytesGrid(width: Int, height: Int,
                   gray: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // write the INT_RGB backing buffer directly (same 24-bit values the
    // setRGB loop stored, minus w*h color-model round-trips)
    val buf = im.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = gray(x, y) & 0xff
        buf(y * width + x) = (v << 16) | (v << 8) | v
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** 63-bit difference hash (dHash) of a decodable image: bit y*8+x is 1
    * when pixel (x+1, y) is brighter (red channel) than (x, y), over the
    * top-left 9x8 region; the final (7,7) comparison is dropped to keep
    * the signature strictly positive in a signed 64-bit word (engines
    * disagree on 1<<63 overflow — DuckDB raises, Java wraps). Brightness
    * GRADIENTS survive uniform lighting shifts and mild re-encodes, which
    * is why dHash near-dups where an exact byte hash cannot. None for
    * undecodable payloads or images smaller than 9x8.
    *
    * Row-local (the modality analog of SimHash's text signature); pair
    * mining reuses [[graft.ops.Dedup.simHashPairs]] with bits=63.
    */
  def dHash(bytes: Array[Byte]): Option[Long] =
    Option(try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null })
      .filter(im => im.getWidth >= 9 && im.getHeight >= 8)
      .map { im =>
        var sig = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8 && !(x == 7 && y == 7)) {
            val l = (im.getRGB(x, y) >> 16) & 0xff
            val r = (im.getRGB(x + 1, y) >> 16) & 0xff
            if (r > l) sig |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        sig
      }

  /** Packed 0xRRGGBB of pixel (0,0) of a decodable image payload — the
    * round-trip probe the resize gate reads back.
    */
  def pixel0(bytes: Array[Byte]): Option[Int] =
    Option(try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null })
      .map(_.getRGB(0, 0) & 0xffffff)

  /** REAL image resize: ImageIO decode → Graphics2D bilinear resample →
    * PNG re-encode, row-local inside one mapPartitions pass (no shuffle —
    * this is the decode/resample/encode the byte-domain [[resize]]
    * documents as its seam). Input columns: (doc_id, payload, target_w,
    * target_h) — per-row targets, so bucketed thumbnail ladders are one
    * pass. Payloads the reader rejects are dropped; at 100 TB the work is
    * pure per-row CPU and scales with executor count.
    */
  def resizeImages(spark: SparkSession, withTargets: DataFrame):
      Dataset[ResizedImage] = {
    import spark.implicits._
    withTargets
      .select(col("doc_id"), col("payload"),
        col("target_w").cast("int"), col("target_h").cast("int"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.flatMap { case (id, bytes, tw, th) =>
        require(tw > 0 && th > 0, s"target dims must be positive: $tw x $th")
        Option(try javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null })
          .map { im =>
            val out = new java.awt.image.BufferedImage(tw, th,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, tw, th, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedImage(id, im.getWidth, im.getHeight, tw, th,
              bos.toByteArray)
          }
      })
  }

  // ---- video CONTAINER metadata (no decode) -------------------------------
  // No video codecs exist offline, but the container headers are plain
  // structured bytes: ISO BMFF (MP4) boxes and RIFF (AVI) chunks carry
  // duration, dimensions, and the codec fourcc without touching a single
  // compressed frame. This is the honest middle ground between "stub" and
  // "decode": a curation pipeline can filter/route/shard on real geometry
  // and codec long before any GPU decode stage.

  final case class VideoMeta(doc_id: Long, container: String,
                             duration_ms: Long, width: Int, height: Int,
                             codec: String)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def le32(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** First ISO-BMFF box of type `tpe` within [from, to); returns
    * (payloadStart, payloadEnd) — payload excludes the 8/16-byte header.
    */
  private def findBox(b: Array[Byte], from: Int, to: Int,
                      tpe: String): Option[(Int, Int)] = {
    var o = from
    while (o + 8 <= to) {
      val size32 = be32(b, o)
      val (hdr, size) =
        if (size32 == 1L && o + 16 <= to) (16, be64(b, o + 8))
        else if (size32 == 0L) (8, (to - o).toLong) // "extends to end"
        else (8, size32)
      if (size < hdr || o + size > to) return None // corrupt: stop walking
      if (fourcc(b, o + 4) == tpe) return Some((o + hdr, o + size.toInt))
      o += size.toInt
    }
    None
  }

  /** MP4/MOV: mvhd → duration, first trak's tkhd → 16.16 fixed-point
    * dimensions, its stsd sample entry → codec fourcc. Corrupt or
    * truncated boxes yield None, never a task failure.
    */
  private[graft] def parseMp4(id: Long, b: Array[Byte]): Option[VideoMeta] =
    try {
      if (b.length < 16 || fourcc(b, 4) != "ftyp") return None
      for {
        (moovS, moovE) <- findBox(b, 0, b.length, "moov")
        (mvhdS, _) <- findBox(b, moovS, moovE, "mvhd")
        (trakS, trakE) <- findBox(b, moovS, moovE, "trak")
        (tkhdS, tkhdE) <- findBox(b, trakS, trakE, "tkhd")
      } yield {
        val v = b(mvhdS) & 0xff // FullBox version
        val (timescale, duration) =
          if (v == 1) (be32(b, mvhdS + 20), be64(b, mvhdS + 24))
          else (be32(b, mvhdS + 12), be32(b, mvhdS + 16))
        // width/height are the LAST 8 bytes of tkhd in both versions
        val width = (be32(b, tkhdE - 8) >> 16).toInt
        val height = (be32(b, tkhdE - 4) >> 16).toInt
        val codec = (for {
          (mdiaS, mdiaE) <- findBox(b, trakS, trakE, "mdia")
          (minfS, minfE) <- findBox(b, mdiaS, mdiaE, "minf")
          (stblS, stblE) <- findBox(b, minfS, minfE, "stbl")
          (stsdS, stsdE) <- findBox(b, stblS, stblE, "stsd")
          if stsdS + 16 <= stsdE && be32(b, stsdS + 4) >= 1
        } yield fourcc(b, stsdS + 12)).getOrElse("")
        val durMs =
          if (timescale > 0) duration * 1000L / timescale else 0L
        VideoMeta(id, "mp4", durMs, width, height, codec)
      }
    } catch { case _: Exception => None }

  /** First RIFF chunk of fourcc `tpe` (or LIST with listType `tpe`) within
    * [from, to); returns the data range (after the 12-byte LIST header /
    * 8-byte chunk header).
    */
  private def findRiff(b: Array[Byte], from: Int, to: Int,
                       tpe: String): Option[(Int, Int)] = {
    var o = from
    while (o + 8 <= to) {
      val id = fourcc(b, o)
      val size = le32(b, o + 8 - 4) // chunk size after the fourcc
      // Compare as LONG before narrowing: le32 is unsigned (never < 0),
      // so a size ≥ 2³¹ would wrap NEGATIVE in `end`, slide it back to
      // ≤ o, pass an `end > to` check, and stall the walk forever — the
      // corrupt-stop guard must reject the oversize chunk first.
      if (size > (to - o - 8).toLong) return None
      val end = o + 8 + size.toInt
      if (id == "LIST" && o + 12 <= to && fourcc(b, o + 8) == tpe)
        return Some((o + 12, end))
      if (id == tpe) return Some((o + 8, end))
      o = end + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** AVI (RIFF): `hdrl/avih` → µs-per-frame, frame count, dimensions;
    * `strl/strh` with fccType `vids` → codec fourcc. Little-endian
    * throughout; corrupt input yields None.
    */
  private[graft] def parseAvi(id: Long, b: Array[Byte]): Option[VideoMeta] =
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        return None
      for {
        (hdrlS, hdrlE) <- findRiff(b, 12, b.length, "hdrl")
        (avihS, avihE) <- findRiff(b, hdrlS, hdrlE, "avih")
        if avihS + 40 <= avihE
      } yield {
        val usPerFrame = le32(b, avihS)
        val totalFrames = le32(b, avihS + 16)
        val width = le32(b, avihS + 32).toInt
        val height = le32(b, avihS + 36).toInt
        val codec = (for {
          (strlS, strlE) <- findRiff(b, hdrlS, hdrlE, "strl")
          (strhS, strhE) <- findRiff(b, strlS, strlE, "strh")
          if strhS + 8 <= strhE && fourcc(b, strhS) == "vids"
        } yield fourcc(b, strhS + 4)).getOrElse("")
        VideoMeta(id, "avi", usPerFrame * totalFrames / 1000L,
          width, height, codec)
      }
    } catch { case _: Exception => None }

  /** Container metadata for a video payload column: MP4 (ISO BMFF) and AVI
    * (RIFF) headers parsed without decoding a frame. Unparseable payloads
    * are dropped (filter upstream on format if presence matters).
    */
  def videoMetadata(spark: SparkSession, withPayload: DataFrame):
      Dataset[VideoMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4(id, bytes).orElse(parseAvi(id, bytes))
      })
  }

  // ---- compressed-audio CONTAINER metadata (no decode) --------------------
  // Same posture as video: no MP3/FLAC codecs offline, but the headers are
  // structured bytes — enough for duration/rate/channel routing before any
  // decode stage.

  final case class AudioMeta(doc_id: Long, container: String,
                             duration_ms: Long, sample_rate: Int,
                             channels: Int, bitrate_kbps: Int)

  // MPEG1 Layer III bitrate (kbps) and sample-rate tables, indexed by the
  // 4-bit / 2-bit header fields
  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0)
  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  /** MP3 (MPEG1 Layer III, CBR): sync + first frame header → bitrate,
    * sample rate, channel mode; duration from total size at the constant
    * bitrate (the ID3-less CBR estimate every tag-free tool uses).
    */
  private[graft] def parseMp3(id: Long, b: Array[Byte]): Option[AudioMeta] =
    try {
      if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xfe) != 0xfa)
        return None // sync 0xFFF + MPEG1(11) + Layer III(01) + any protection
      val bitrate = Mp3Bitrates((b(2) & 0xf0) >> 4)
      val rate = Mp3Rates((b(2) & 0x0c) >> 2)
      if (bitrate == 0 || rate == 0) return None // free/bad indices
      val channels = if (((b(3) & 0xc0) >> 6) == 3) 1 else 2
      Some(AudioMeta(id, "mp3",
        duration_ms = b.length.toLong * 8L / bitrate,
        sample_rate = rate, channels = channels, bitrate_kbps = bitrate))
    } catch { case _: Exception => None }

  /** FLAC: `fLaC` magic + STREAMINFO block → sample rate (20 bits),
    * channels (3 bits + 1), total samples (36 bits) → exact duration.
    * Bitrate is not a FLAC header concept — reported as 0.
    */
  private[graft] def parseFlac(id: Long, b: Array[Byte]): Option[AudioMeta] =
    try {
      if (b.length < 42 || fourcc(b, 0) != "fLaC") return None
      if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
      val o = 8 + 10 // skip block header (4) + min/max blocksize/framesize
      // 64 bits at o: rate(20) | channels-1(3) | bps-1(5) | samples(36)
      val hi = be64(b, o)
      val rate = (hi >>> 44).toInt
      val channels = ((hi >>> 41) & 0x7).toInt + 1
      val samples = hi & 0xfffffffffL
      if (rate == 0) return None
      Some(AudioMeta(id, "flac",
        duration_ms = samples * 1000L / rate,
        sample_rate = rate, channels = channels, bitrate_kbps = 0))
    } catch { case _: Exception => None }

  /** Container metadata for compressed-audio payloads (MP3 CBR / FLAC). */
  def audioMetadata(spark: SparkSession, withPayload: DataFrame):
      Dataset[AudioMeta] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFlac(id, bytes).orElse(parseMp3(id, bytes))
      })
  }

  /** Minimal CBR MP3: one valid MPEG1-Layer-III header + zero padding to
    * `totalBytes` (duration_ms = totalBytes * 8 / bitrate_kbps).
    */
  def buildMp3(bitrateIdx: Int, rateIdx: Int, mono: Boolean,
               totalBytes: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && rateIdx >= 0 && rateIdx <= 2)
    require(totalBytes >= 4)
    val out = new Array[Byte](totalBytes)
    out(0) = 0xff.toByte
    out(1) = 0xfb.toByte // MPEG1, Layer III, no CRC
    out(2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
    out(3) = (if (mono) 0xc0 else 0x00).toByte
    out
  }

  /** Minimal FLAC: magic + STREAMINFO with the packed rate/channels/samples
    * word (duration_ms = totalSamples * 1000 / sampleRate).
    */
  def buildFlac(sampleRate: Int, channels: Int,
                totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val hi = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) |
      (16L - 1 << 36) | // 16-bit samples
      totalSamples
    "fLaC".getBytes("ISO-8859-1") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ // last-block flag + STREAMINFO(34)
      new Array[Byte](10) ++ // blocksize/framesize bounds
      (0 until 8).map(i => ((hi >>> ((7 - i) * 8)) & 0xff).toByte).toArray ++
      new Array[Byte](16) // md5 of unencoded audio
  }

  // fixture builders — the same byte layouts the parsers read, used by the
  // q83 gate and MultimodalSpec to synthesize payloads offline (no real
  // media files ship in this environment)

  private def beBytes(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def leBytes(v: Long): Array[Byte] = beBytes(v).reverse
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    beBytes(payload.length + 8L) ++
      tpe.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ payload

  /** Minimal valid MP4: ftyp + moov(mvhd v0 + trak(tkhd + mdia/minf/stbl/
    * stsd(codec))) — exactly the boxes [[parseMp4]] reads.
    */
  def buildMp4(timescale: Long, durationUnits: Long, width: Int,
               height: Int, codec: String): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ beBytes(512) ++
        "isomiso2".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd",
      new Array[Byte](4) ++ // version 0 + flags
        beBytes(0) ++ beBytes(0) ++ // ctime, mtime
        beBytes(timescale) ++ beBytes(durationUnits) ++
        new Array[Byte](80)) // rate..next_track_id
    val tkhd = box("tkhd",
      new Array[Byte](4) ++
        beBytes(0) ++ beBytes(0) ++ beBytes(1) ++ beBytes(0) ++ // times, id
        beBytes(durationUnits) ++
        new Array[Byte](52) ++ // reserved, layer, group, volume, matrix
        beBytes(width.toLong << 16) ++ beBytes(height.toLong << 16))
    val stsd = box("stsd",
      new Array[Byte](4) ++ beBytes(1) ++ // entry_count = 1
        beBytes(86) ++ codec.getBytes("ISO-8859-1") ++ new Array[Byte](78))
    val trak = box("trak",
      tkhd ++ box("mdia", box("minf", box("stbl", stsd))))
    ftyp ++ box("moov", mvhd ++ trak)
  }

  private def riffChunk(tpe: String, payload: Array[Byte]): Array[Byte] =
    tpe.getBytes("ISO-8859-1") ++ leBytes(payload.length.toLong) ++
      payload ++ (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(tpe: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", tpe.getBytes("ISO-8859-1") ++ payload)

  private def aviHeader(usPerFrame: Long, totalFrames: Long, width: Int,
                        height: Int, codec: String): Array[Byte] = {
    val avih = riffChunk("avih",
      leBytes(usPerFrame) ++ new Array[Byte](12) ++
        leBytes(totalFrames) ++ new Array[Byte](12) ++
        leBytes(width.toLong) ++ leBytes(height.toLong) ++
        new Array[Byte](16))
    val strh = riffChunk("strh",
      "vids".getBytes("ISO-8859-1") ++ codec.getBytes("ISO-8859-1") ++
        new Array[Byte](48))
    riffList("hdrl", avih ++ riffList("strl", strh))
  }

  /** Minimal valid AVI: RIFF(AVI ) + LIST hdrl(avih + LIST strl(strh)) —
    * exactly the chunks [[parseAvi]] reads.
    */
  def buildAvi(usPerFrame: Long, totalFrames: Long, width: Int,
               height: Int, codec: String): Array[Byte] = {
    val body = "AVI ".getBytes("ISO-8859-1") ++
      aviHeader(usPerFrame, totalFrames, width, height, codec)
    "RIFF".getBytes("ISO-8859-1") ++ leBytes(body.length.toLong) ++ body
  }

  // ---- MJPEG-in-AVI frame decode (REAL, stock JVM) ------------------------
  // MJPEG is the one video codec family a stock JVM decodes without any
  // native wiring: every `movi` '##dc' chunk is a complete JPEG image and
  // javax.imageio ships a JPEG codec. The builder writes real ImageIO-
  // encoded frames and the decoder reads each chunk back to a raster —
  // so the frame-level plumbing (chunk walk, per-frame decode, frame-row
  // explosion, partition parallelism) is exercised for real end to end.
  // Inter-frame codecs (H264/AV1/...) still land on the documented stub
  // seam in extractFeatures and need JNI/ffmpeg wiring at deploy time.

  /** A real JPEG payload: solid gray `gray` at `width`x`height`, encoded by
    * the JDK's JPEG writer.
    */
  def jpegBytes(width: Int, height: Int, gray: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = gray & 0xff
    val rgb = (g << 16) | (g << 8) | g
    // one Arrays.fill of the INT_RGB backing buffer — same 24-bit pixels
    // the setRGB loop stored, so the JPEG encoder sees identical input
    java.util.Arrays.fill(im.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  /** MJPEG AVI with one real JPEG per entry of `grays` (solid-gray frames —
    * deterministic, so oracle/spec can predict geometry and luma).
    */
  def buildMjpegAvi(usPerFrame: Long, width: Int, height: Int,
                    grays: Seq[Int]): Array[Byte] = {
    val movi = riffList("movi",
      grays.iterator.map(g => riffChunk("00dc", jpegBytes(width, height, g)))
        .foldLeft(Array.empty[Byte])(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++
      aviHeader(usPerFrame, grays.length.toLong, width, height, "MJPG") ++ movi
    "RIFF".getBytes("ISO-8859-1") ++ leBytes(body.length.toLong) ++ body
  }

  /** Byte ranges (start, end) of the video frame chunks ('##dc'/'##db')
    * inside an AVI's `movi` list, in stream order.
    */
  private[graft] def moviFrameChunks(b: Array[Byte]): Seq[(Int, Int)] = {
    // null guard first: a NULL payload cell decodes to a null array, and
    // a task-killing NPE is the wrong failure mode for one bad row
    if (b == null || b.length < 12 ||
        fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return Nil
    val out = Seq.newBuilder[(Int, Int)]
    for ((s, e) <- findRiff(b, 12, b.length, "movi")) {
      var o = s
      var ok = true
      while (ok && o + 8 <= e) {
        val id = fourcc(b, o)
        val size = le32(b, o + 8 - 4).toInt
        // LONG-range check before computing `end`: a positive size near
        // 2³¹ makes `o + 8 + size` wrap negative, passing both the old
        // `size < 0` and `end > e` checks and driving o negative — the
        // next fourcc would throw out of this (catch-less) walker as a
        // task failure. Same guard shape as findRiff/parseWavPcm.
        if (size < 0 || size.toLong > (e - o - 8).toLong) ok = false
        else {
          val end = o + 8 + size
          if (id.endsWith("dc") || id.endsWith("db")) out += ((o + 8, end))
          o = end + (size & 1)
        }
      }
    }
    out.result()
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
                              height: Int, mean_luma: Double)

  /** Real per-frame decode of MJPEG AVI payloads: one output row per movi
    * frame chunk ImageIO can decode, with the decoded raster's geometry and
    * its mean luma (Rec.601 over ≤256x256 stride-sampled probe points —
    * same megapixel guard as extractFeatures). Partition-parallel; frames
    * of one payload stay in one task (a payload is one row). Chunks that
    * fail to decode are dropped — count frames against container metadata
    * upstream if loss matters.
    */
  def decodeMjpegFrames(spark: SparkSession, withPayload: DataFrame):
      Dataset[VideoFrame] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        moviFrameChunks(bytes).iterator.zipWithIndex.flatMap {
          case ((s, e), i) =>
            val in = new java.io.ByteArrayInputStream(bytes, s, e - s)
            Option(try javax.imageio.ImageIO.read(in)
                   catch { case _: Exception => null })
              .map { im =>
                val w = im.getWidth
                val h = im.getHeight
                val stepX = math.max(1, w / 256)
                val stepY = math.max(1, h / 256)
                var sum = 0.0
                var n = 0L
                if (stepX == 1 && stepY == 1) {
                  // full-raster probe: ONE bulk getRGB instead of w*h
                  // per-pixel color-model calls — identical values, same
                  // row-major summation order, so the double is bit-equal
                  val px = im.getRGB(0, 0, w, h, null, 0, w)
                  var j = 0
                  while (j < px.length) {
                    val rgb = px(j)
                    sum += 0.299 * ((rgb >>> 16) & 0xff) +
                      0.587 * ((rgb >>> 8) & 0xff) + 0.114 * (rgb & 0xff)
                    j += 1
                  }
                  n = px.length.toLong
                } else {
                  var y = 0
                  while (y < h) {
                    var x = 0
                    while (x < w) {
                      val rgb = im.getRGB(x, y)
                      sum += 0.299 * ((rgb >>> 16) & 0xff) +
                        0.587 * ((rgb >>> 8) & 0xff) + 0.114 * (rgb & 0xff)
                      n += 1
                      x += stepX
                    }
                    y += stepY
                  }
                }
                VideoFrame(id, i, w, h, sum / n)
              }
        }
      })
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
          def rasterFeature(im: java.awt.image.BufferedImage): MediaFeature = {
            val w = im.getWidth
            val h = im.getHeight
            val ch = im.getColorModel.getNumComponents
            val stepX = math.max(1, w / 256)
            val stepY = math.max(1, h / 256)
            val sums = new Array[Double](4) // r, g, b, a from packed ARGB
            var n = 0L
            if (stepX == 1 && stepY == 1) {
              // full-raster probe: ONE bulk getRGB instead of w*h
              // per-pixel color-model calls; integer-valued double sums
              // are order-exact, so the feature is bit-identical
              val px = im.getRGB(0, 0, w, h, null, 0, w)
              var j = 0
              while (j < px.length) {
                val rgb = px(j)
                sums(0) += (rgb >>> 16) & 0xff
                sums(1) += (rgb >>> 8) & 0xff
                sums(2) += rgb & 0xff
                sums(3) += (rgb >>> 24) & 0xff
                j += 1
              }
              n = px.length.toLong
            } else {
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
            }
            val feature = Array.tabulate(dim)(i =>
              if (i < sums.length) (sums(i) / (n * 255.0)).toFloat else 0f)
            MediaFeature(id, bytes.length.toLong, fmt, checksum,
              decoded = true, w, h, ch, feature)
          }
          val decodedImage: Option[MediaFeature] =
            (if (fmt.startsWith("image/")) decodeImage(bytes) else None)
              .map(rasterFeature)
          // video: REAL first-frame decode for MJPEG-in-AVI (stock-JVM JPEG
          // codec); inter-frame codecs fall through to the stub seam below
          val decodedVideo: Option[MediaFeature] =
            (if (fmt.startsWith("video/"))
               moviFrameChunks(bytes).headOption.flatMap { case (s, e) =>
                 Option(try javax.imageio.ImageIO.read(
                     new java.io.ByteArrayInputStream(bytes, s, e - s))
                   catch { case _: Exception => null })
               }
             else None).map(rasterFeature)
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
          decodedImage.orElse(decodedAudio).orElse(decodedVideo).getOrElse {
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

  // ---- WAV PCM: REAL sample-domain audio features ------------------------
  // PCM is uncompressed, so the RIFF walk IS the full decode (stock JVM, no
  // codec seam needed) — this is the audio analog of the q122 MJPEG frame
  // decode: genuine sample arithmetic, not header metadata.

  final case class WavFeature(doc_id: Long, sample_rate: Int,
                              n_samples: Long, peak_abs: Long, rms_sq: Long,
                              silence_ppm: Long)

  /** Minimal canonical WAV: RIFF/WAVE, `fmt ` PCM 16-bit mono at
    * `sampleRate`, one `data` chunk of little-endian samples — exactly the
    * layout [[parseWavPcm]] reads back.
    */
  def buildWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive: $sampleRate")
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = Array[Byte](1, 0, 1, 0) ++ // PCM, mono
      leBytes(sampleRate.toLong) ++
      leBytes(sampleRate.toLong * 2) ++ // byte rate
      Array[Byte](2, 0, 16, 0) // block align, bits/sample
    riffChunk("RIFF",
      "WAVE".getBytes("ISO-8859-1") ++
        riffChunk("fmt ", fmt) ++ riffChunk("data", data))
  }

  /** RIFF walk + PCM read-back: (sampleRate, mono 16-bit samples). None on
    * anything that is not PCM 16-bit mono WAV — corrupt bytes route to a
    * stub/quarantine path, never a task failure (the [[parseMp3]] posture).
    */
  def parseWavPcm(b: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "WAVE")
        return None
      var off = 12
      var rate = 0
      var ok = false
      var samples: Array[Short] = null
      while (off + 8 <= b.length) {
        val tpe = fourcc(b, off)
        val len = le32(b, off + 4).toInt
        val body = off + 8
        // Corrupt-stop guard (the findBox posture): a negative len (high
        // bit set) or one overrunning the buffer would make `off`
        // non-increasing — an infinite loop, not an exception — so bail to
        // the quarantine path before touching the chunk body. The bounds
        // compare stays in LONG: `body + len` overflows Int for len near
        // 2³¹, sneaking a ~2 GB allocation past the guard (OutOfMemoryError
        // is an Error — the catch below never sees it).
        if (len < 0 || len.toLong > (b.length - body).toLong) return None
        if (tpe == "fmt " && len >= 16) {
          val audioFormat = (b(body) & 0xff) | ((b(body + 1) & 0xff) << 8)
          val channels = (b(body + 2) & 0xff) | ((b(body + 3) & 0xff) << 8)
          val bits = (b(body + 14) & 0xff) | ((b(body + 15) & 0xff) << 8)
          rate = le32(b, body + 4).toInt
          ok = audioFormat == 1 && channels == 1 && bits == 16
        } else if (tpe == "data") {
          val n = len / 2
          samples = Array.tabulate(n) { i =>
            ((b(body + 2 * i) & 0xff) |
              ((b(body + 2 * i + 1) & 0xff) << 8)).toShort
          }
        }
        off = body + len + (len & 1) // RIFF chunks pad to even
      }
      if (ok && rate > 0 && samples != null) Some((rate, samples)) else None
    } catch { case _: Exception => None }

  /** Sample-domain features per payload: peak amplitude, integer mean
    * square (Σs² div n — BIGINT-safe: s² ≤ 2³⁰, so n may reach 2³³ samples
    * per file before overflow), and the silence ratio in exact ppm — a
    * frame of `frame` samples is silent when its peak stays under
    * `silenceThreshold` (the trim-leading/trailing-silence and
    * dead-air-detection primitive; the tail frame counts, short as it is).
    *
    * Row-local mapPartitions over the binary column — the q122/q123 shape:
    * decode cost is embarrassingly parallel, nothing shuffles, and at
    * 100 TB the decoded samples never materialize as a relation (only the
    * fixed-width feature row leaves the partition).
    */
  def wavFeatures(spark: SparkSession, withPayload: DataFrame,
                  frame: Int = 200,
                  silenceThreshold: Int = 1000): Dataset[WavFeature] = {
    import spark.implicits._
    require(frame > 0, s"frame must be positive: $frame")
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWavPcm(bytes).map { case (rate, s) =>
          var sumSq = 0L
          var peak = 0L
          var i = 0
          var framePeak = 0L
          var silent = 0L
          var frames = 0L
          while (i < s.length) {
            val v = s(i).toLong
            val a = math.abs(v)
            sumSq += v * v
            if (a > peak) peak = a
            if (a > framePeak) framePeak = a
            if ((i + 1) % frame == 0 || i == s.length - 1) {
              frames += 1
              if (framePeak < silenceThreshold) silent += 1
              framePeak = 0L
            }
            i += 1
          }
          WavFeature(id, rate, s.length.toLong, peak,
            if (s.length == 0) 0L else sumSq / s.length,
            if (frames == 0) 0L else 1000000L * silent / frames)
        }
      })
  }

  /** Scene-cut census over decoded video frames ([[decodeMjpegFrames]]
    * output): a cut fires between consecutive frames whose mean-luma
    * difference meets `threshold` — the shot-boundary / keyframe-selection
    * primitive (sample one frame per scene instead of per time unit).
    *
    * JPEG is lossy, so EXACT luma is decoder-shaped; callers gate scene
    * decisions with a threshold far above the codec's reconstruction
    * error (the q193 fixture alternates ~40 vs ~200 luma against a
    * threshold of 80 — a ±5 decode wobble cannot flip a decision).
    * One lag() window keyed by doc (frames of a payload are few and
    * colocated), then a per-doc aggregate on the same key.
    */
  /** Silence trim as a real TRANSFORMATION round trip (the audio analog
    * of the q123 image resize): parse the PCM WAV, drop leading and
    * trailing all-silent frames (`frame` samples each, silent = peak
    * under `threshold`), re-encode the kept span as a WAV. Interior
    * silence is preserved (trimming is lead/tail only — the
    * dataset-prep convention; dead-air REMOVAL mid-stream would break
    * alignment with transcripts). All-silent input yields an empty-data
    * WAV, not None — "we processed it and nothing remained" is a
    * different fact from "not decodable".
    */
  def trimSilence(bytes: Array[Byte], frame: Int = 100,
                  threshold: Int = 1000): Option[Array[Byte]] = {
    require(frame > 0, s"frame must be positive: $frame")
    parseWavPcm(bytes).map { case (rate, s) =>
      val nFrames = (s.length + frame - 1) / frame
      def framePeak(f: Int): Int = {
        var p = 0
        var i = f * frame
        val end = math.min(s.length, (f + 1) * frame)
        while (i < end) {
          val a = math.abs(s(i).toInt); if (a > p) p = a; i += 1
        }
        p
      }
      var first = 0
      while (first < nFrames && framePeak(first) < threshold) first += 1
      var last = nFrames - 1
      while (last >= first && framePeak(last) < threshold) last -= 1
      val kept =
        if (first > last) Array.empty[Short]
        else s.slice(first * frame, math.min(s.length, (last + 1) * frame))
      buildWav(rate, kept)
    }
  }

  final case class AudioFp(doc_id: Long, n_frames: Long, fp: String)

  /** Audio content fingerprint (the Haitsma–Kalker / Shazam family's
    * energy-delta core, mono-band form): decode the PCM WAV, sum |sample|
    * per `frame`-sample frame, and emit one bit per consecutive frame
    * PAIR — '1' when energy rose, '0' otherwise — capped at `maxBits`
    * bits. Loudness-profile shape, not raw bytes: two encodings of the
    * same material fingerprint identically as long as their frame
    * energies rank the same way, which is why this (and not sha256) is
    * the audio near-dup key. Sub-two-frame audio fingerprints to the
    * empty string.
    *
    * Row-local mapPartitions (the q122/q180 shape): decode cost is
    * embarrassingly parallel, nothing shuffles, only the ≤`maxBits`-char
    * fingerprint leaves the partition.
    */
  def audioFingerprint(spark: SparkSession, withPayload: DataFrame,
                       frame: Int = 200, maxBits: Int = 63):
      Dataset[AudioFp] = {
    import spark.implicits._
    require(frame > 0, s"frame must be positive: $frame")
    require(maxBits > 0, s"maxBits must be positive: $maxBits")
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWavPcm(bytes).map { case (_, s) =>
          val nFrames = (s.length + frame - 1) / frame
          val energies = Array.tabulate(nFrames) { f =>
            var e = 0L
            var i = f * frame
            val end = math.min(s.length, (f + 1) * frame)
            while (i < end) { e += math.abs(s(i).toLong); i += 1 }
            e
          }
          val bits = new StringBuilder
          var f = 1
          while (f < nFrames && bits.length < maxBits) {
            bits += (if (energies(f) > energies(f - 1)) '1' else '0')
            f += 1
          }
          AudioFp(id, nFrames.toLong, bits.result())
        }
      })
  }

  /** Audio near-dup groups: payloads sharing an energy-delta fingerprint
    * ([[audioFingerprint]]) form a duplicate family — group_id is the
    * family's smallest doc id (the corpus canonical-member convention),
    * group_size its population. Non-decodable payloads are absent (the
    * quarantine path owns them); a fingerprint-less (sub-two-frame)
    * decodable payload still groups — with the other sub-two-frame ones,
    * the honest answer for content too short to profile.
    *
    * Shape at 100 TB: decode is row-local and runs ONCE — the family
    * stats are windows over the fingerprint, riding a single fp-keyed
    * exchange (a groupBy + join-back would feed the decode lineage to
    * BOTH sides and decode every payload twice — the census-join-back
    * trap, decode flavor). No pair relation ever materializes — exactly
    * the [[dHash]]-groups posture, audio modality.
    */
  def audioNearDupGroups(spark: SparkSession, withPayload: DataFrame,
                         frame: Int = 200, maxBits: Int = 63): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    audioFingerprint(spark, withPayload, frame, maxBits).toDF()
      .withColumn("group_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("n_frames"), col("fp"),
        col("group_id"), col("group_size"))
  }

  def sceneCuts(frames: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("_prev", lag(col("mean_luma"), 1).over(w))
      .withColumn("_cut",
        when(col("_prev").isNotNull &&
          abs(col("mean_luma") - col("_prev")) >= threshold, 1L)
          .otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), sum("_cut").as("n_cuts"))
  }
}
