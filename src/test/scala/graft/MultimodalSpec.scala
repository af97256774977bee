package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload schema, metadata, deterministic
  * partition-parallel feature extraction (stubbed decode).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello world"), (2L, "spark multimodal payloads"), (3L, "hello world"))
    .toDF("doc_id", "text")

  test("withPayload produces binary + typed metadata") {
    val p = Multimodal.withPayload(docs)
    val f = p.schema("payload").dataType.typeName
    assert(f == "binary")
    val meta = p.select($"media_meta.n_bytes").as[Long].collect()
    assert(meta.toSeq == Seq(11L, 25L, 11L))
  }

  test("frameSample windows the payload bytes with stride and clamps short docs") {
    val p = Multimodal.withPayload(docs) // "hello world" = 11 bytes
    val got = Multimodal.frameSample(p, "payload", frameSize = 4, stride = 3)
      .select($"doc_id", $"n_frames",
        expr("transform(frames, f -> cast(f as string))").as("fs"))
      .as[(Long, Long, Seq[String])].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // 11 bytes, frame 4, stride 3 → floor((11-4)/3)+1 = 3 frames
    assert(got(1L) == ((3L, Seq("hell", "lo w", "worl"))))
    val tiny = Seq((9L, "ab")).toDF("doc_id", "text")
    val g2 = Multimodal.frameSample(Multimodal.withPayload(tiny), "payload", 4, 3)
      .select($"n_frames", size($"frames")).as[(Long, Int)].head()
    assert(g2 == ((0L, 0)))
  }

  test("resize decimates payload bytes toward the target size") {
    val p = Multimodal.withPayload(docs)
    val got = Multimodal.resize(spark, p, targetBytes = 5)
      .collect().map(r => r.doc_id -> ((r.n_bytes_in, r.n_bytes_out,
        new String(r.payload, "UTF-8")))).toMap
    // "hello world" (11 bytes), k = ceil(11/5) = 3 → indices 0,3,6,9
    assert(got(1L) == ((11L, 4L, "hlwl")))
    assert(got.values.forall(v => v._2 <= 5 || v._1 <= 5))
  }

  test("extractFeatures REALLY decodes a generated PNG (javax.imageio): geometry + channel means") {
    // 4x2 solid red PNG, plus a corrupt image/* payload that must fall back
    // to the stub path instead of failing the task
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 4; y <- 0 until 2) img.setRGB(x, y, 0xff0000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val rows = Seq(
      (42L, baos.toByteArray, "image/png"),
      (43L, Array[Byte](1, 2, 3), "image/png"),
      (44L, "just text".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "format")
    val got = Multimodal.extractFeatures(spark, rows, dim = 4)
      .collect().sortBy(_.doc_id)
    val png = got(0)
    assert(png.decoded && png.width == 4 && png.height == 2 && png.channels == 3)
    assert(math.abs(png.feature(0) - 1.0f) < 1e-6, "red mean must be 1.0")
    assert(png.feature(1) == 0f && png.feature(2) == 0f, "green/blue means 0")
    assert(!got(1).decoded && got(1).width == -1) // corrupt image -> stub
    assert(!got(2).decoded) // non-image format never attempts decode
  }

  test("extractFeatures REALLY decodes a generated WAV (javax.sound.sampled): geometry + amplitude") {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
    // 800 frames of a full-scale square wave, 16-bit PCM mono 8000 Hz:
    // mean |amplitude| is exactly 1.0 (32768 unreachable; use -32768/32767
    // alternating => mean ≈ 1.0 within 16-bit quantization)
    val frames = 800
    val pcm = new Array[Byte](frames * 2)
    for (f <- 0 until frames) {
      val s: Short = if (f % 2 == 0) 32767 else -32768
      pcm(2 * f) = (s & 0xff).toByte          // little-endian lo
      pcm(2 * f + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val rows = Seq(
      (50L, baos.toByteArray, "audio/wav"),
      (51L, Array[Byte](9, 9, 9), "audio/wav"),
      (52L, baos.toByteArray, "video/mp4"))
      .toDF("doc_id", "payload", "format")
    val got = Multimodal.extractFeatures(spark, rows, dim = 4)
      .collect().sortBy(_.doc_id)
    val wav = got(0)
    assert(wav.decoded, "PCM WAV must decode for real")
    assert(wav.width == frames, "width carries the frame count")
    assert(wav.height == 8000, "height carries the sample rate")
    assert(wav.channels == 1)
    assert(math.abs(wav.feature(0) - 1.0f) < 1e-3,
      s"square-wave mean |amp| must be ~1.0, got ${wav.feature(0)}")
    assert(wav.feature(1) == 0f, "dims past channel count are zero")
    assert(!got(1).decoded && got(1).width == -1) // corrupt audio -> stub
    assert(!got(2).decoded, "video never claims a decode (no codec offline)")
  }

  test("parseMp4 round-trips the builder and reads v1 mvhd/64-bit sizes") {
    val b = Multimodal.buildMp4(timescale = 600, durationUnits = 3600,
      width = 1920, height = 1080, codec = "avc1")
    val got = Multimodal.parseMp4(7L, b)
    assert(got.contains(Multimodal.VideoMeta(7L, "mp4",
      duration_ms = 3600 * 1000L / 600, width = 1920, height = 1080,
      codec = "avc1")))
    // duration uses integer division on the movie timescale
    val odd = Multimodal.parseMp4(1L, Multimodal.buildMp4(600, 601, 2, 2, "hev1"))
    assert(odd.get.duration_ms == 601 * 1000L / 600)
  }

  test("parseAvi round-trips the builder (little-endian throughout)") {
    val b = Multimodal.buildAvi(usPerFrame = 33333, totalFrames = 300,
      width = 640, height = 480, codec = "XVID")
    val got = Multimodal.parseAvi(9L, b)
    assert(got.contains(Multimodal.VideoMeta(9L, "avi",
      duration_ms = 33333L * 300 / 1000, width = 640, height = 480,
      codec = "XVID")))
  }

  test("video parsers reject garbage, truncation, and the wrong container") {
    val mp4 = Multimodal.buildMp4(1000, 1000, 64, 48, "avc1")
    val avi = Multimodal.buildAvi(1000, 10, 64, 48, "MJPG")
    assert(Multimodal.parseMp4(1L, "not a video at all".getBytes).isEmpty)
    assert(Multimodal.parseAvi(1L, "RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.parseMp4(1L, avi).isEmpty)
    assert(Multimodal.parseAvi(1L, mp4).isEmpty)
    assert(Multimodal.parseMp4(1L, mp4.take(40)).isEmpty)   // truncated moov
    assert(Multimodal.parseMp4(1L, Array.empty[Byte]).isEmpty)
    // corrupt box size (claims to extend past the buffer) stops the walk
    val corrupt = mp4.clone()
    corrupt(mp4.length - 100) = 0x7f.toByte
    assert(Multimodal.parseMp4(1L, corrupt.take(mp4.length - 60)).isEmpty ||
      Multimodal.parseMp4(1L, corrupt.take(mp4.length - 60)).nonEmpty) // never throws
  }

  test("videoMetadata extracts per-container metadata and drops unparseable rows") {
    val rows = Seq(
      (1L, Multimodal.buildMp4(1000, 5000, 320, 240, "av01")),
      (2L, Multimodal.buildAvi(40000, 250, 720, 576, "H264")),
      (3L, "plain text payload".getBytes)).toDF("doc_id", "payload")
    val got = Multimodal.videoMetadata(spark, rows).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got.keySet == Set(1L, 2L)) // text row dropped, no task failure
    assert(got(1L) == Multimodal.VideoMeta(1L, "mp4", 5000, 320, 240, "av01"))
    assert(got(2L) == Multimodal.VideoMeta(2L, "avi", 10000, 720, 576, "H264"))
  }

  test("parseMp3/parseFlac round-trip the builders; reject non-audio") {
    // MP3: CBR estimate — 128 kbps over 16000 bytes = 1000 ms exactly
    val mp3 = Multimodal.buildMp3(bitrateIdx = 9, rateIdx = 0,
      mono = true, totalBytes = 16000)
    assert(Multimodal.parseMp3(3L, mp3).contains(Multimodal.AudioMeta(
      3L, "mp3", duration_ms = 1000, sample_rate = 44100, channels = 1,
      bitrate_kbps = 128)))
    // FLAC: exact STREAMINFO duration, fractional remainder floor-divided
    val flac = Multimodal.buildFlac(sampleRate = 48000, channels = 2,
      totalSamples = 48000L * 3 + 12345)
    assert(Multimodal.parseFlac(5L, flac).contains(Multimodal.AudioMeta(
      5L, "flac", duration_ms = (48000L * 3 + 12345) * 1000 / 48000,
      sample_rate = 48000, channels = 2, bitrate_kbps = 0)))
    assert(Multimodal.parseMp3(1L, flac).isEmpty)
    assert(Multimodal.parseFlac(1L, mp3).isEmpty)
    assert(Multimodal.parseMp3(1L, Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseFlac(1L, flac.take(20)).isEmpty) // truncated
    // free-bitrate (idx 0) and reserved sample-rate indices are rejected
    val badRate = mp3.clone(); badRate(2) = ((9 << 4) | (3 << 2)).toByte
    assert(Multimodal.parseMp3(1L, badRate).isEmpty)
  }

  test("decodeMjpegFrames REALLY decodes every movi JPEG: order, geometry, luma") {
    // three solid-gray frames; JPEG of a uniform image quantizes only the
    // DC coefficient, so decoded luma lands within ±2 of the source gray
    val grays = Seq(0, 128, 255)
    val avi = Multimodal.buildMjpegAvi(33333, width = 20, height = 10, grays)
    val rows = Seq((7L, avi)).toDF("doc_id", "payload")
    val got = Multimodal.decodeMjpegFrames(spark, rows)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3)
    assert(got.forall(f => f.width == 20 && f.height == 10))
    assert(got.map(_.frame_idx).toSeq == Seq(0, 1, 2), "stream order kept")
    for ((f, g) <- got.zip(grays))
      assert(math.abs(f.mean_luma - g) <= 2.0,
        s"frame ${f.frame_idx}: mean_luma ${f.mean_luma} vs source gray $g")
    // headerless garbage, a frameless (header-only) AVI, and a NULL
    // payload cell all yield no rows (never a task-killing NPE)
    val headerOnly = Multimodal.buildAvi(33333, 3, 20, 10, "MJPG")
    val empty = Seq((8L, Array[Byte](1, 2, 3)), (9L, headerOnly),
      (10L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    assert(Multimodal.decodeMjpegFrames(spark, empty).count() == 0)
  }

  test("extractFeatures decodes an MJPEG AVI's FIRST frame for video/*; " +
    "other video payloads still land on the stub seam") {
    val avi = Multimodal.buildMjpegAvi(33333, width = 8, height = 6, Seq(255))
    val rows = Seq(
      (1L, avi, "video/avi"),
      (2L, Multimodal.buildAvi(33333, 5, 8, 6, "H264"), "video/avi"))
      .toDF("doc_id", "payload", "format")
    val got = Multimodal.extractFeatures(spark, rows, dim = 4)
      .collect().sortBy(_.doc_id)
    assert(got(0).decoded && got(0).width == 8 && got(0).height == 6)
    assert(got(0).feature(0) > 0.97f, "white frame: red mean ~1.0")
    assert(!got(1).decoded, "no-frame non-MJPEG payload stays a stub")
  }

  test("resizeImages REALLY resamples: geometry, lossless solid-color " +
    "round-trip, garbage dropped") {
    val rows = Seq(
      (1L, Multimodal.pngBytes(16, 8, 0x336699), 4, 2),
      (2L, Multimodal.pngBytes(5, 5, 0xff0000), 10, 10), // upscale too
      (3L, Array[Byte](9, 9, 9), 4, 4))                  // undecodable
      .toDF("doc_id", "payload", "target_w", "target_h")
    val got = Multimodal.resizeImages(spark, rows).collect().sortBy(_.doc_id)
    assert(got.length == 2, "undecodable payload must be dropped")
    val a = got(0)
    assert(a.width_in == 16 && a.height_in == 8 &&
      a.width_out == 4 && a.height_out == 2)
    // output is a real PNG of the target geometry with the EXACT color
    // (bilinear over a constant field is constant; PNG is lossless)
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(a.payload))
    assert(im.getWidth == 4 && im.getHeight == 2)
    for (x <- 0 until 4; y <- 0 until 2)
      assert((im.getRGB(x, y) & 0xffffff) == 0x336699)
    assert(Multimodal.pixel0(got(1).payload).contains(0xff0000))
  }

  test("extractFeatures is deterministic, dimension-correct, partition-independent") {
    val p = Multimodal.withPayload(docs)
    def run(parts: Int) =
      Multimodal.extractFeatures(spark, p.repartition(parts), dim = 4)
        .collect().sortBy(_.doc_id)
    val a = run(1); val b = run(3)
    assert(a.map(_.feature.toSeq).toSeq == b.map(_.feature.toSeq).toSeq)
    assert(a.forall(_.feature.length == 4))
    // identical payloads → identical checksum and features
    assert(a(0).checksum == a(2).checksum)
    assert(a(0).feature.toSeq == a(2).feature.toSeq)
    assert(a(0).checksum != a(1).checksum)
  }

  test("dHash: real PNG round trip matches the arithmetic definition") {
    import graft.ops.Multimodal
    val gray = (x: Int, y: Int) => (x * 37 + y * 91) % 251
    val sig = Multimodal.dHash(Multimodal.pngBytesGrid(9, 8, gray)).get
    var want = 0L
    for (y <- 0 until 8; x <- 0 until 8 if !(x == 7 && y == 7))
      if (gray(x + 1, y) > gray(x, y)) want |= 1L << (y * 8 + x)
    assert(sig == want)
    assert(sig >= 0L)                    // 63-bit contract: never negative
  }

  test("dHash: brightness-shift invariance and single-pixel locality") {
    import graft.ops.Multimodal
    val base = (x: Int, y: Int) => (x * 37 + y * 91) % 200
    val sig = Multimodal.dHash(Multimodal.pngBytesGrid(9, 8, base)).get
    // +40 uniform lighting shift (no clip): gradients unchanged -> same hash
    val brighter = Multimodal.dHash(
      Multimodal.pngBytesGrid(9, 8, (x, y) => base(x, y) + 40)).get
    assert(brighter == sig)
    // one edited pixel flips at most its two adjacent comparisons
    val edited = Multimodal.dHash(Multimodal.pngBytesGrid(9, 8,
      (x, y) => if (x == 4 && y == 3) 255 else base(x, y))).get
    assert(java.lang.Long.bitCount(sig ^ edited) <= 2)
    assert(edited != sig)
  }

  test("dHash: undecodable and too-small payloads yield None") {
    import graft.ops.Multimodal
    assert(Multimodal.dHash(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dHash(Multimodal.pngBytes(8, 8, 0x336699)).isEmpty)
    assert(Multimodal.dHash(Multimodal.pngBytes(9, 8, 0x336699)).contains(0L))
  }

  test("WAV: PCM16 build/parse round trip is bit-exact; junk yields None") {
    import graft.ops.Multimodal
    val s = Array[Short](0, 1000, -32768, 32767, -1)
    val bytes = Multimodal.buildWav(8000, s)
    val Some((rate, back)) = Multimodal.parseWavPcm(bytes)
    assert(rate == 8000)
    assert(back.toSeq == s.toSeq)
    assert(Multimodal.parseWavPcm("junk".getBytes).isEmpty)
    assert(Multimodal.parseWavPcm(Array.empty[Byte]).isEmpty)
  }

  test("wavFeatures: frame silence (tail frame counts), integer mean square") {
    import graft.ops.Multimodal
    import spark.implicits._
    val s = Array[Short](0, 1000, -32768, 32767, -1)
    val df = Seq((7L, Multimodal.buildWav(16000, s)))
      .toDF("doc_id", "payload")
    val f = Multimodal.wavFeatures(spark, df, frame = 2,
      silenceThreshold = 1000).collect().head
    assert(f.doc_id == 7L && f.sample_rate == 16000 && f.n_samples == 5L)
    assert(f.peak_abs == 32768L)
    // sum sq = 0 + 1e6 + 2^30 + 32767^2 + 1 = 2148418114; div 5
    assert(f.rms_sq == 429683622L)
    // frames [0,1000] peak 1000 (not < 1000), [-32768,32767], tail [-1]
    // silent → 1 of 3
    assert(f.silence_ppm == 333333L)
  }

  test("audioFingerprint: energy-delta bits, maxBits cap, scale invariance") {
    import graft.ops.Multimodal
    import spark.implicits._
    // frame=2 → energies: |10|+|20|=30, |5|+|5|=10, |40|+|0|=40, tail |8|=8
    // deltas: 10<30 → '0', 40>10 → '1', 8<40 → '0'
    val s = Array[Short](10, -20, 5, 5, 40, 0, 8)
    val half = s.map(v => (v / 2).toShort) // same energy ORDER, half loudness
    val df = Seq(
      (1L, Multimodal.buildWav(8000, s)),
      (2L, Multimodal.buildWav(8000, half)),
      (3L, Array[Byte](1, 2, 3)),           // undecodable → quarantined
      (4L, Multimodal.buildWav(8000, Array[Short](7)))) // 1 frame → "" fp
      .toDF("doc_id", "payload")
    val got = Multimodal.audioFingerprint(spark, df, frame = 2)
      .collect().map(f => f.doc_id -> f).toMap
    assert(got(1L).fp == "010" && got(1L).n_frames == 4L)
    assert(got(2L).fp == "010")               // loudness-invariant shape
    assert(!got.contains(3L))                 // decode failure is absent
    assert(got(4L).fp == "" && got(4L).n_frames == 1L)
    val capped = Multimodal.audioFingerprint(spark, df, frame = 2,
      maxBits = 2).collect().map(f => f.doc_id -> f.fp).toMap
    assert(capped(1L) == "01")
  }

  test("audioNearDupGroups: same fingerprint → one family, min-id canonical") {
    import graft.ops.Multimodal
    import spark.implicits._
    val a = Array[Short](10, -20, 5, 5, 40, 0, 8)   // fp 010
    val b = a.map(v => (v / 2).toShort)              // fp 010 (near dup of a)
    // energies 10, 40, 30, 8 → deltas '1', '0', '0'
    val c = Array[Short](5, 5, 40, 0, 10, -20, 8)
    val df = Seq((5L, Multimodal.buildWav(8000, a)),
      (2L, Multimodal.buildWav(8000, b)),
      (9L, Multimodal.buildWav(8000, c)))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioNearDupGroups(spark, df, frame = 2)
      .select($"doc_id", $"group_id", $"group_size")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(5L) == ((2L, 2L)))   // family canonical = min id (2)
    assert(got(2L) == ((2L, 2L)))
    assert(got(9L) == ((9L, 1L)))   // different shape is its own family
  }
}
