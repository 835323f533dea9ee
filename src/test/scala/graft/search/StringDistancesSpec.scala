package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Reference test vectors for the pluggable StringDistance strategies —
  * TestLevenshteinDistance.cs:29, TestJaroWinklerDistance.cs:30,
  * TestNGramDistance.cs (n = 1, 2, 3), tolerance 0.001 as in the
  * reference asserts. */
class StringDistancesSpec extends AnyFunSuite {

  private def ≈(a: Double, b: Double): Boolean = math.abs(a - b) < 0.001

  test("Levenshtein similarity matches reference vectors") {
    val d = LevenshteinSim
    assert(d.similarity("al", "al") == 1.0)
    assert(≈(d.similarity("martha", "marhta"), 0.6666))
    assert(≈(d.similarity("jones", "johnson"), 0.4285))
    assert(≈(d.similarity("abcvwxyz", "cabvwxyz"), 0.75))
    assert(≈(d.similarity("dwayne", "duane"), 0.666))
    assert(≈(d.similarity("dixon", "dicksonx"), 0.5))
    assert(≈(d.similarity("six", "ten"), 0.0))
    assert(≈(d.similarity("", "al"), 0.0))
    // d(zac ephron, zac efron) == d(zac ephron, kai ephron)
    assert(≈(d.similarity("zac ephron", "zac efron"),
      d.similarity("zac ephron", "kai ephron")))
    assert(d.similarity("brittney spears", "britney spears") >
      d.similarity("brittney spears", "brittney startzman"))
  }

  test("Jaro-Winkler similarity matches reference vectors") {
    val d = JaroWinklerSim
    assert(d.similarity("al", "al") == 1.0)
    val m = d.similarity("martha", "marhta")
    assert(m > 0.961 && m < 0.962)
    val j = d.similarity("jones", "johnson")
    assert(j > 0.832 && j < 0.833)
    val a = d.similarity("abcvwxyz", "cabvwxyz")
    assert(a > 0.958 && a < 0.959)
    val w = d.similarity("dwayne", "duane")
    assert(w > 0.84 && w < 0.841)
    val x = d.similarity("dixon", "dicksonx")
    assert(x > 0.813 && x < 0.814)
    assert(d.similarity("fvie", "ten") == 0.0)
    assert(d.similarity("zac ephron", "zac efron") >
      d.similarity("zac ephron", "kai ephron"))
    assert(d.similarity("brittney spears", "britney spears") >
      d.similarity("brittney spears", "brittney startzman"))
    // the uncapped-prefix deviation engages only past maxlen 10
    // (min(0.1, 1/|max|) < 0.1): value from the algorithm run by hand
    assert(≈(d.similarity("abcd", "abcdefghijklmno"), 0.8207))
  }

  test("NGram(1) similarity matches reference vectors") {
    val d = NGramSim(1)
    assert(d.similarity("al", "al") == 1.0)
    assert(d.similarity("a", "a") == 1.0)
    assert(≈(d.similarity("b", "a"), 0.0))
    assert(≈(d.similarity("martha", "marhta"), 0.6666))
    assert(≈(d.similarity("jones", "johnson"), 0.4285))
    assert(≈(d.similarity("natural", "contrary"), 0.25))
    assert(≈(d.similarity("abcvwxyz", "cabvwxyz"), 0.75))
    assert(≈(d.similarity("dwayne", "duane"), 0.666))
    assert(≈(d.similarity("dixon", "dicksonx"), 0.5))
    assert(≈(d.similarity("six", "ten"), 0.0))
    assert(≈(d.similarity("zac ephron", "zac efron"),
      d.similarity("zac ephron", "kai ephron")))
    assert(d.similarity("brittney spears", "britney spears") >
      d.similarity("brittney spears", "brittney startzman"))
    assert(≈(d.similarity("12345678", "12890678"),
      d.similarity("12345678", "72385698")))
  }

  test("NGram(2) similarity matches reference vectors") {
    val d = NGramSim(2)
    assert(d.similarity("al", "al") == 1.0)
    assert(d.similarity("a", "a") == 1.0)
    assert(≈(d.similarity("b", "a"), 0.0))
    assert(≈(d.similarity("a", "aa"), 0.5))
    assert(≈(d.similarity("martha", "marhta"), 0.6666))
    assert(≈(d.similarity("jones", "johnson"), 0.4285))
    assert(≈(d.similarity("natural", "contrary"), 0.25))
    assert(≈(d.similarity("abcvwxyz", "cabvwxyz"), 0.625))
    assert(≈(d.similarity("dwayne", "duane"), 0.5833))
    assert(≈(d.similarity("dixon", "dicksonx"), 0.5))
    assert(≈(d.similarity("six", "ten"), 0.0))
    assert(d.similarity("zac ephron", "zac efron") >
      d.similarity("zac ephron", "kai ephron"))
    assert(≈(d.similarity("0012345678", "0012890678"),
      d.similarity("0012345678", "0072385698")))
  }

  test("NGram(3) similarity matches reference vectors") {
    val d = NGramSim(3)
    assert(d.similarity("al", "al") == 1.0)
    assert(d.similarity("a", "a") == 1.0)
    assert(≈(d.similarity("b", "a"), 0.0))
    assert(≈(d.similarity("martha", "marhta"), 0.7222))
    assert(≈(d.similarity("jones", "johnson"), 0.4762))
    assert(≈(d.similarity("natural", "contrary"), 0.2083))
  }

  test("suggestSimilar ranks by score desc with the strategy plugged in") {
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    import graft.index.IndexBuilder
    val idx = IndexBuilder.build(
      spark.createDataset(TinyCorpus.turns).toDF(), 4)
    // JW path runs through the typed-map branch over trigram candidates
    val jw = Suggest.suggestSimilar(idx, "tble", JaroWinklerSim, 0.5, 5)
      .collect()
    assert(jw.nonEmpty)
    val scores = jw.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse, s"not desc: $scores")
    jw.foreach { r =>
      val expect = JaroWinklerSim.similarity(r.getString(0), "tble")
      assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    }
    // Levenshtein path (native column) agrees with the scalar strategy
    val lv = Suggest.suggestSimilar(idx, "tble", LevenshteinSim, 0.3, 5)
      .collect()
    lv.foreach { r =>
      val expect = LevenshteinSim.similarity(r.getString(0), "tble")
      assert(math.abs(r.getDouble(2) - expect) < 1e-6)
    }
  }
}
