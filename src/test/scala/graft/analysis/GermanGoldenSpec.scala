package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL golden validation against the reference's own German test
  * corpus (`test/contrib/Analyzers/De/data.txt` for the Caumanns
  * stemmer, `data_din2.txt` for the DIN-5007-2 phone-book variant —
  * TestGermanStemFilter.cs). The fixtures were NOT produced by this
  * repo, so agreement is independent evidence the
  * from-the-published-algorithm implementation reproduces the
  * reference's behavior exactly, quirks included. Skipped when the
  * reference checkout is absent. */
class GermanGoldenSpec extends AnyFunSuite {

  private val base = "/root/reference/test/contrib/Analyzers/De"
  private def available =
    java.nio.file.Files.exists(java.nio.file.Paths.get(base))

  /** `word;stem` lines; '#' comments, blank lines, BOM stripped. */
  private def pairs(f: String): Seq[(String, String)] =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/$f")), "UTF-8")
      .replace("﻿", "")
      .split('\n').toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(w, s) = l.split(";", 2); (w.trim, s.trim)
      }

  test("Caumanns stemmer matches every reference data.txt pair") {
    assume(available)
    val ps = pairs("data.txt")
    assert(ps.size >= 30) // 31 word;stem pairs after comments/blanks
    val mismatches = ps.collect {
      case (w, s) if CaumannsGermanStemmer.stem(w) != s =>
        s"$w: got ${CaumannsGermanStemmer.stem(w)}, reference $s"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} of ${ps.size} diverge: " +
        mismatches.mkString("; "))
  }

  test("DIN2 phone-book variant matches every data_din2.txt pair") {
    assume(available)
    val ps = pairs("data_din2.txt")
    assert(ps.nonEmpty)
    val mismatches = ps.collect {
      case (w, s) if CaumannsGermanStemmer.stemDin2(w) != s =>
        s"$w: got ${CaumannsGermanStemmer.stemDin2(w)}, reference $s"
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} of ${ps.size} diverge: " +
        mismatches.mkString("; "))
  }
}
