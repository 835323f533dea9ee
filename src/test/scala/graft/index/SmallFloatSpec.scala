package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** SmallFloat byte315 norm codec (SmallFloat.cs / Similarity.cs:501-503).
  * Expected bytes/floats hand-derived from the published format on paper
  * (top 11 bits of the IEEE single re-biased by (63-15)<<3 = 384), same
  * method as the stemmer vectors — never read back from the code. */
class SmallFloatSpec extends AnyFunSuite {

  private val vectors = Seq[(Float, Int, Float)](
    (-3.5f, 0, 0.0f),
    (0.0f, 0, 0.0f),
    (1e-10f, 1, 1.25f / 2147483648.0f), // underflow -> smallest nonzero
    // the format's zero band [2^-31, 1.125*2^-31): smallfloat == fzero
    // encodes 0 (the reference's strict-< boundary; non-monotone quirk —
    // positives BELOW the band encode 1)
    (4.6566129e-10f, 0, 0.0f),
    (5.0e-10f, 0, 0.0f),
    (0.25f, 116, 0.25f),
    (0.5f, 120, 0.5f),
    (0.57735026f, 120, 0.5f), // lengthNorm(len=3), quantized down
    (0.70710678f, 121, 0.625f), // lengthNorm(len=2)
    (1.0f, 124, 1.0f),
    (2.0f, 128, 2.0f),
    (3.0f, 130, 3.0f),
    (5.0f, 133, 5.0f),
    (7.0f, 135, 7.0f),
    (1e10f, 255, 1.75f * 4294967296.0f)) // overflow -> max

  test("hand-derived encode/decode vectors") {
    vectors.foreach { case (f, b, rt) =>
      assert((SmallFloat.floatToByte315(f) & 0xff) == b, s"encode $f")
      assert(SmallFloat.byte315ToFloat(b.toByte) == rt, s"decode $b")
    }
  }

  test("decode is a right inverse of encode on every byte") {
    (0 to 255).foreach { b =>
      val f = SmallFloat.decodeNorm(b.toByte)
      assert((SmallFloat.encodeNorm(f) & 0xff) == b, s"byte $b")
    }
  }

  test("encode is monotone non-decreasing over positive floats") {
    val xs = (1 to 4000).map(i => math.exp(i / 150.0 - 14.0).toFloat)
    xs.zip(xs.drop(1)).foreach { case (a, c) =>
      assert((SmallFloat.floatToByte315(a) & 0xff)
        <= (SmallFloat.floatToByte315(c) & 0xff), s"$a vs $c")
    }
  }

  test("norm table decodes exactly like byte315ToFloat") {
    (0 to 255).foreach(b =>
      assert(SmallFloat.normTable(b) == SmallFloat.byte315ToFloat(b.toByte)))
  }
}
