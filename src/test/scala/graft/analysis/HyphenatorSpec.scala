package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Knuth–Liang hyphenation + the hyphenation decompounder.
  *
  * The headline vector is the classic published worked example (Liang
  * 1983 / TeXbook appendix H): the US-English patterns hy3ph, he2n,
  * hena4, hen5at, ina, n2at, 1tio, 2io, o2n applied to "hyphenation"
  * produce interletter values that break it hy-phen-ation. The il
  * trace (boundary index → max digit) is: il[3]=3 (hy3ph), il[6]=2
  * (he2n), il[7]=5 (hen5at beats n2at's 2), il[8]=4 (hena4 beats
  * 1tio's 1), il[9]=2 (2io), il[11]=2 (o2n); odd values at 3 and 7 →
  * prefix lengths 2 and 6. */
class HyphenatorSpec extends AnyFunSuite {

  private val texPatterns = Seq("hy3ph", "he2n", "hena4", "hen5at",
    "ina", "n2at", "1tio", "2io", "o2n")

  test("TeXbook worked example: hy-phen-ation") {
    val h = new Hyphenator(texPatterns)
    assert(h.hyphenate("hyphenation") == Some(Vector(0, 2, 6, 11)))
  }

  test("pattern parsing: digits bind to the following boundary") {
    val (l0, v0) = Hyphenator.parsePattern("hy3ph")
    assert(l0 == "hyph" && v0.toSeq == Seq(0, 0, 3, 0, 0))
    val (l, v) = Hyphenator.parsePattern(".ach4")
    assert(l == ".ach" && v.toSeq == Seq(0, 0, 0, 0, 4))
    val (l2, v2) = Hyphenator.parsePattern("4te.")
    assert(l2 == "te." && v2.toSeq == Seq(4, 0, 0, 0))
  }

  test("word-boundary dots anchor patterns to word edges") {
    // 1ba breaks every "ba"; .ba2t suppresses it at the word start
    val h = new Hyphenator(Seq("1ba", ".ba2t"))
    assert(h.hyphenate("abba") == Some(Vector(0, 2, 4)))
    assert(h.hyphenate("bat") == None) // .ba2t max-folds the 1 to 2
    assert(h.hyphenate("combat") == Some(Vector(0, 3, 6)))
  }

  test("remain/push bounds exclude edge breaks") {
    val h = new Hyphenator(Seq("a1b"))
    // "ab": break position 1 needs remain<=1 and 1 <= len-push = 1
    assert(h.hyphenate("ab") == Some(Vector(0, 1, 2)))
    assert(h.hyphenate("ab", remain = 2) == None)
    assert(h.hyphenate("ab", push = 2) == None)
    // too short outright: len < remain + push
    assert(h.hyphenate("a") == None)
  }

  test("no legal break / non-letter word → None") {
    val h = new Hyphenator(Seq("x1y"))
    assert(h.hyphenate("hyphenation") == None)
    assert(h.hyphenate("xy2z") == None)
  }

  test("exceptions override patterns for the whole word") {
    // patterns would break a1s everywhere; the exception pins as-so
    val h = new Hyphenator(Seq("a1s"), Seq("as-so"))
    assert(h.hyphenate("asso") == Some(Vector(0, 2, 4)))
    // non-excepted words still use patterns (a1s → ca-sa)
    assert(h.hyphenate("casa") == Some(Vector(0, 2, 4)))
    // exception bound is strict (< len - push): a final-letter break
    // in the exception is dropped, leaving none → None
    val h2 = new Hyphenator(Seq.empty, Seq("ab-c"))
    assert(h2.hyphenate("abc") == None)
  }

  test("FOP-format XML loader: patterns + exceptions, comments stripped") {
    val xml = """<?xml version="1.0" encoding="utf-8"?>
      |<hyphenation-info>
      |<!-- a comment with 9z9 noise -->
      |<patterns>
      |hy3ph he2n hena4
      |hen5at ina n2at 1tio 2io o2n
      |</patterns>
      |<exceptions>
      |ta-ble
      |</exceptions>
      |</hyphenation-info>""".stripMargin
    val h = Hyphenator.fromXml(xml)
    assert(h.hyphenate("hyphenation") == Some(Vector(0, 2, 6, 11)))
    assert(h.hyphenate("table") == Some(Vector(0, 2, 5)))
  }

  // --- the decompound filter over hyphenation points ---

  private val germanish = Analyzers.HyphenDecompound(
    // crafted break rules: f|s and f|f boundaries, the old-orthography
    // ff|a elision point, and the genitive s|p joint
    patterns = Seq("f1s", "f1f", "ff1a", "s1p"),
    dict = Set("dampf", "schiff", "fahrt", "dampfschiff",
      "arbeit", "platz"))

  test("hyphenation decompound: spans between points, dict-checked") {
    // dampfschiffahrt: points 0|5|10|11|15 → dampf, dampfschiff,
    // schiff (5-11), fahrt (10-15); 10-11 is under minSubword;
    // schif/ahrt miss the dictionary even with the -1 retry
    val ts = Analyzers.tokenize(germanish, "the dampfschiffahrt")
    assert(ts.map(t => (t.pos, t.term)).sorted == Vector(
      (1, "dampf"), (1, "dampfschiff"), (1, "dampfschiffahrt"),
      (1, "fahrt"), (1, "schiff")))
  }

  test("genitive-s retry: arbeitsplatz yields arbeit") {
    // points 0|7|12: span 0-7 "arbeits" misses, minus-last-char
    // "arbeit" hits (the reference's binding-char retry); 7-12 platz
    val ts = Analyzers.tokenize(germanish, "arbeitsplatz")
    assert(ts.map(_.term).sorted == Vector(
      "arbeit", "arbeitsplatz", "platz"))
  }

  test("onlyLongestMatch keeps one winner per start point") {
    val longest = germanish.copy(onlyLongestMatch = true)
    val ts = Analyzers.tokenize(longest, "dampfschiffahrt")
    // start 0: dampf(5) then dampfschiff(11) wins; start 5: schiff;
    // start 10: fahrt; start 11: nothing
    assert(ts.map(_.term).sorted == Vector(
      "dampfschiff", "dampfschiffahrt", "fahrt", "schiff"))
  }

  test("short tokens and unhyphenatable tokens pass through alone") {
    val ts = Analyzers.tokenize(germanish, "dampf zzzz dampfxxxx")
    // "dampf" is at minWordSize 5 but has no hyphen point → original
    // only; "zzzz" is under minWordSize; "dampfxxxx" breaks at f|x?
    // no — no pattern matches, original only
    assert(ts.map(_.term) == Vector("dampf", "zzzz", "dampfxxxx"))
  }

  test("positions: subwords stack on the compound's position") {
    val ts = Analyzers.tokenize(germanish, "arbeitsplatz dampf")
    assert(ts.filter(_.term != "dampf").forall(_.pos == 0))
    assert(ts.find(_.term == "dampf").map(_.pos) == Some(1))
  }
}
