package graft

import org.scalatest.concurrent.TimeLimits
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.SpanSugar._

import graft.ops.Multimodal

/** Adversarial fuzz of every binary container parser against the
  * documented contract: corrupt bytes route to None/Nil, never a task
  * failure — and never a HANG. The hang class is real: two bugs of the
  * same shape were found by review (a WAV chunk length with the high bit
  * set left `off` non-increasing; a RIFF size ≥ 2³¹ wrapped negative
  * after `toInt` and slid the walk backwards). This spec pins the whole
  * class: every parser must terminate fast and return cleanly on
  * (a) uniform random bytes, (b) VALID payloads with every 32-bit length
  * field region bit-flipped, (c) truncations at every boundary, and
  * (d) handcrafted oversize/negative length fields.
  *
  * `failAfter` turns an infinite loop into a test failure instead of a
  * suite hang.
  */
class ParserFuzzSpec extends AnyFunSuite with TimeLimits {

  private def rng = new scala.util.Random(0x9e3779b9L)

  private val validPayloads: Seq[(String, Array[Byte])] = Seq(
    "wav" -> Multimodal.buildWav(8000, Array.tabulate(600)(i => (i * 17).toShort)),
    "avi" -> Multimodal.buildAvi(33333, 42, 64, 48, "MJPG"),
    "mjpeg-avi" -> Multimodal.buildMjpegAvi(33333, 32, 24, Seq(80, 170)),
    "mp4" -> Multimodal.buildMp4(1000, 5000, 640, 360, "avc1"),
    "mp3" -> Multimodal.buildMp3(9, 0, mono = true, 4096),
    "flac" -> Multimodal.buildFlac(44100, 2, 441000L))

  private def allParsers(b: Array[Byte]): Unit = {
    Multimodal.parseWavPcm(b)
    Multimodal.parseMp4(1L, b)
    Multimodal.parseAvi(1L, b)
    Multimodal.parseMp3(1L, b)
    Multimodal.parseFlac(1L, b)
    Multimodal.moviFrameChunks(b)
  }

  test("random byte blobs: every parser terminates and returns cleanly") {
    val r = rng
    failAfter(60.seconds) {
      for (len <- Seq(0, 1, 7, 8, 12, 13, 64, 1000, 4096); _ <- 1 to 20) {
        val b = new Array[Byte](len)
        r.nextBytes(b)
        allParsers(b)
      }
    }
  }

  test("valid payloads with corrupted bytes: terminate, no throw") {
    val r = rng
    failAfter(120.seconds) {
      for ((_, orig) <- validPayloads) {
        // single-byte corruptions across the whole header region (first
        // 256 bytes cover every size/fourcc field in these builders)
        for (pos <- 0 until math.min(orig.length, 256); v <- Seq(0x00, 0x80, 0xff)) {
          val b = orig.clone()
          b(pos) = v.toByte
          allParsers(b)
        }
        // random multi-byte corruption bursts
        for (_ <- 1 to 200) {
          val b = orig.clone()
          for (_ <- 0 to r.nextInt(8)) {
            b(r.nextInt(b.length)) = r.nextInt(256).toByte
          }
          allParsers(b)
        }
      }
    }
  }

  test("truncations at every boundary: terminate, no throw") {
    failAfter(60.seconds) {
      for ((_, orig) <- validPayloads;
           cut <- 0 until math.min(orig.length, 128)) {
        allParsers(orig.take(cut))
        allParsers(orig.take(orig.length - cut))
      }
    }
  }

  test("positive-but-overflowing lengths (MSB 0x7F) cannot allocate, crash, or stall") {
    // len near 2^31 stays POSITIVE after .toInt, so `off + len` wraps —
    // the class that bypasses a `len < 0` guard: a 'data' chunk would
    // allocate ~2 GB (OOME = Error, uncatchable by `case _: Exception`),
    // and an inner movi chunk would drive the walk offset negative
    failAfter(10.seconds) {
      def le(b: Array[Byte], o: Int, v: Long): Unit = {
        b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
        b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
      }
      def put4(b: Array[Byte], o: Int, s: String): Unit =
        s.getBytes("ISO-8859-1").copyToArray(b, o)
      // WAV whose data chunk claims 0x7FFFFFF0 bytes
      val w = new Array[Byte](128)
      put4(w, 0, "RIFF"); le(w, 4, 120); put4(w, 8, "WAVE")
      put4(w, 12, "fmt "); le(w, 16, 16)
      w(20) = 1; w(22) = 1; le(w, 24, 8000); w(34) = 16
      put4(w, 36, "data"); le(w, 40, 0x7ffffff0L)
      assert(Multimodal.parseWavPcm(w).isEmpty)
      // AVI with a VALID outer movi LIST whose first inner chunk claims
      // 0x7FFFFFF0 — the inner walk must stop cleanly, not go negative
      val a = new Array[Byte](64)
      put4(a, 0, "RIFF"); le(a, 4, 56); put4(a, 8, "AVI ")
      put4(a, 12, "LIST"); le(a, 16, 44); put4(a, 20, "movi")
      put4(a, 24, "00dc"); le(a, 28, 0x7ffffff0L)
      assert(Multimodal.moviFrameChunks(a).isEmpty)
    }
  }

  test("handcrafted oversize/negative 32-bit length fields cannot stall a RIFF walk") {
    failAfter(10.seconds) {
      for (evil <- Seq(0xfffffff8L, 0xffffffffL, 0x80000000L, 0x7fffffffL)) {
        // RIFF/WAVE with one chunk whose length field is adversarial
        val b = new Array[Byte](64)
        def put4(o: Int, s: String): Unit =
          s.getBytes("ISO-8859-1").copyToArray(b, o)
        def le(o: Int, v: Long): Unit = {
          b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
          b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
        }
        put4(0, "RIFF"); le(4, 56); put4(8, "WAVE")
        put4(12, "fmt "); le(16, evil)
        assert(Multimodal.parseWavPcm(b).isEmpty)
        // same shape through the AVI walker (findRiff) and movi scan
        put4(8, "AVI ")
        assert(Multimodal.parseAvi(1L, b).isEmpty)
        assert(Multimodal.moviFrameChunks(b).isEmpty)
      }
    }
  }

  test("valid payloads still parse after the guards (no over-rejection)") {
    assert(Multimodal.parseWavPcm(validPayloads.toMap.apply("wav")).isDefined)
    assert(Multimodal.parseAvi(1L, validPayloads.toMap.apply("avi")).isDefined)
    assert(Multimodal.parseMp4(1L, validPayloads.toMap.apply("mp4")).isDefined)
    assert(Multimodal.parseMp3(1L, validPayloads.toMap.apply("mp3")).isDefined)
    assert(Multimodal.parseFlac(1L, validPayloads.toMap.apply("flac")).isDefined)
    assert(Multimodal.moviFrameChunks(
      validPayloads.toMap.apply("mjpeg-avi")).nonEmpty)
  }
}
