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
}
