package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL golden validation against the reference's own Russian test
  * corpus (test/contrib/Analyzers/Ru/ — 49,673 word→stem pairs plus a
  * prose passage with its expected analyzer output). Unlike the
  * hand-derived Snowball vectors elsewhere in this suite, these
  * fixtures were NOT produced by this repo, so agreement here is
  * independent evidence that the from-the-published-algorithm
  * implementation reproduces the reference's behavior exactly
  * (TestRussianStem.cs:30, TestRussianAnalyzer.cs:46). Skipped when the
  * reference checkout is absent. */
class RussianGoldenSpec extends AnyFunSuite {

  private val base = "/root/reference/test/contrib/Analyzers/Ru"
  private def available =
    java.nio.file.Files.exists(java.nio.file.Paths.get(base))
  private def read(f: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$f")), "UTF-8")
      .replace("﻿", "") // strip BOM

  test("stemmer matches all 49,673 reference word/stem pairs") {
    assume(available)
    def lines(f: String): Seq[String] =
      read(f).split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
    val words = lines("wordsUTF8.txt")
    val stems = lines("stemsUTF8.txt")
    assert(words.size == stems.size && words.size > 49000)
    val mismatches = words.zip(stems).collect {
      case (w, s) if RussianStemmer.stem(w) != s =>
        s"$w: got ${RussianStemmer.stem(w)}, reference $s"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} of ${words.size} diverge; first: " +
        mismatches.take(5).mkString("; "))
  }

  test("analyzer chain matches the reference prose fixture exactly") {
    assume(available)
    // resUTF8.txt is the expected [token][token]… stream for testUTF8:
    // tokenization + RUSSIAN_STOP_WORDS + stemming, end to end
    val want = "\\[([^\\]]*)\\]".r.findAllMatchIn(read("resUTF8.txt"))
      .map(_.group(1)).toVector
    val got = Analyzers.tokenize(Analyzers.Russian, read("testUTF8.txt"))
      .map(_.term)
    assert(got == want)
  }
}
