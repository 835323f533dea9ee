package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property sweeps for the binary media codecs (fixed-seed scalacheck
  * generators, no scalatest bridge — the CodecSpec pattern):
  * encode->decode round-trips over random geometry/content, and
  * decoder robustness: random garbage and random truncation must raise
  * cleanly, never mis-decode or loop. */
class MediaCodecsFuzzSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val dims = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 24)
    seed <- Gen.chooseNum(0, 255)
  } yield (w, h, seed)

  test("BMP round-trip: random dims and content, mean exact") {
    samples(dims, 200).foreach { case (w, h, s) =>
      val g = (k: Int) => (k * 31 + s) % 256
      val d = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, g))
      assert(d.width == w && d.height == h, s"($w,$h)")
      val want = (0 until w * h).map(g(_)).sum / (w * h).toDouble
      assert(math.abs(d.meanVal - want) < 1e-9, s"($w,$h,$s)")
      // payload accessor inverts the bottom-up flip exactly
      assert(MediaCodecs.bmpGray(MediaCodecs.encodeBmp(w, h, g)).toSeq ==
        (0 until w * h).map(g(_)))
    }
  }

  test("WAV round-trip: random sample vectors survive exactly") {
    val gen = for {
      n <- Gen.chooseNum(0, 500)
      seed <- Gen.chooseNum(0, 10000)
    } yield Array.tabulate[Short](n)(i =>
      (((i * 7919 + seed) % 65536) - 32768).toShort)
    samples(gen, 200).foreach { s =>
      assert(MediaCodecs.wavSamples(MediaCodecs.encodeWav(s)).toSeq ==
        s.toSeq)
      val d = MediaCodecs.decodeWav(MediaCodecs.encodeWav(s))
      assert(d.nSamples == s.length &&
        d.durationMs == s.length.toLong * 1000 / 8000)
    }
  }

  test("Y4M round-trip: random frame counts and luma") {
    val gen = for {
      fr <- Gen.chooseNum(1, 12)
      seed <- Gen.chooseNum(0, 255)
    } yield (fr, seed)
    samples(gen, 100).foreach { case (fr, s) =>
      val luma = (f: Int, j: Int) => (f * 131 + j * 17 + s) % 256
      val b = MediaCodecs.encodeY4m(fr, luma)
      val d = MediaCodecs.decodeY4m(b)
      assert(d.frames == fr && d.width == 16 && d.height == 8)
      val (w, h, first) = MediaCodecs.y4mFirstFrameLuma(b)
      assert(first.toSeq == (0 until w * h).map(luma(0, _)))
    }
  }

  test("decoders reject random garbage without mis-decoding") {
    val junk = for {
      n <- Gen.chooseNum(0, 300)
      seed <- Gen.chooseNum(0, 1 << 20)
    } yield Array.tabulate[Byte](n)(i => ((i * 2654435761L + seed) >> 3).toByte)
    samples(junk, 300).foreach { b =>
      // each decoder must throw (no magic match is astronomically
      // unlikely from this generator) — and must never hang or return
      intercept[Exception](MediaCodecs.decodeBmp(b))
      intercept[Exception](MediaCodecs.decodeWav(b))
      intercept[Exception](MediaCodecs.decodeY4m(b))
    }
  }

  test("decoders reject truncation of valid files at every length") {
    val bmp = MediaCodecs.encodeBmp(5, 3, _ % 256)
    val wav = MediaCodecs.encodeWav(Array.tabulate[Short](16)(_.toShort))
    val y4m = MediaCodecs.encodeY4m(2, (_, j) => j % 256)
    for (cut <- 0 until bmp.length)
      intercept[Exception](MediaCodecs.decodeBmp(bmp.take(cut)))
    for (cut <- 0 until wav.length) // data chunk claims 32 bytes, so
      intercept[Exception](MediaCodecs.decodeWav(wav.take(cut))) // every cut fails
    // a cut landing EXACTLY on a frame boundary is a valid shorter
    // video — only mid-frame/mid-header cuts must throw
    val frameBoundary = (k: Int) =>
      MediaCodecs.Y4mHeader.length + k * (6 + MediaCodecs.y4mFrameBytes)
    for (cut <- 0 until y4m.length
         if cut != frameBoundary(0) && cut != frameBoundary(1))
      intercept[Exception](MediaCodecs.decodeY4m(y4m.take(cut)))
    // the boundary cuts ARE valid shorter videos (0- and 1-frame)
    assert(MediaCodecs.decodeY4m(y4m.take(frameBoundary(0))).frames == 0)
    assert(MediaCodecs.decodeY4m(y4m.take(frameBoundary(1))).frames == 1)
  }
}
