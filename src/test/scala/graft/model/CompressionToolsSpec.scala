package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** zlib stored-field codec (CompressionTools.cs analog): lossless
  * round-trips on every byte shape, real compression on repetitive
  * input, loud failure on garbage. */
class CompressionToolsSpec extends AnyFunSuite {

  test("round-trips: empty, ascii, utf-8, binary, incompressible") {
    val rnd = new scala.util.Random(7)
    val cases = Seq[Array[Byte]](
      Array.empty,
      "hello stored field".getBytes("UTF-8"),
      "δοκιμή — 試験 — испытание".getBytes("UTF-8"),
      Array.tabulate(257)(i => i.toByte),
      Array.fill(65536)(rnd.nextInt().toByte)) // incompressible
    cases.foreach { b =>
      val rt = CompressionTools.decompress(CompressionTools.compress(b))
      assert(java.util.Arrays.equals(rt, b), s"len ${b.length}")
    }
    val s = "a string with ünïcode and repetition repetition repetition"
    assert(CompressionTools.decompressString(
      CompressionTools.compressString(s)) == s)
  }

  test("repetitive input actually shrinks") {
    val b = ("the same clause over and over " * 200).getBytes("UTF-8")
    val c = CompressionTools.compress(b)
    assert(c.length < b.length / 10, s"${c.length} vs ${b.length}")
  }

  test("garbage input fails loudly, not silently") {
    intercept[Exception](
      CompressionTools.decompress("not a zlib stream".getBytes("UTF-8")))
  }
}
