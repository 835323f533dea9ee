package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture
import graft.analysis.Analyzer.Token

/** Golden-vector tests (FIXTURES.md §2; reference pattern: golden text
  * fixtures like test/contrib/Analyzers/Ru/wordsUTF8.txt). */
class AnalyzerSpec extends AnyFunSuite {

  test("lowercase + word break") {
    assert(Analyzer.tokenize("Hello World") ==
      Vector(Token("hello", 0), Token("world", 1)))
  }

  test("punctuation splits words") {
    assert(Analyzer.tokenize("foo,bar;baz.qux") ==
      Vector(Token("foo", 0), Token("bar", 1), Token("baz", 2), Token("qux", 3)))
  }

  test("numbers kept, mixed alnum kept") {
    assert(Analyzer.tokenize("error 404 in v2") ==
      Vector(Token("error", 0), Token("404", 1), Token("v2", 3)))
  }

  test("33-word stop set dropped with position gaps preserved") {
    // StopFilter.cs:52 — position increments preserved
    assert(Analyzer.tokenize("the quick and the dead") ==
      Vector(Token("quick", 1), Token("dead", 4)))
    Analyzer.StopWords.foreach(sw => assert(Analyzer.tokenize(sw).isEmpty))
    assert(Analyzer.StopWords.size == 33)
  }

  test("possessive 's stripped (StandardFilter)") {
    assert(Analyzer.tokenize("o'brien's dog's") ==
      Vector(Token("o'brien", 0), Token("dog", 1)))
  }

  test("interior apostrophe kept") {
    assert(Analyzer.tokenize("don't") == Vector(Token("don't", 0)))
  }

  test("max token length 255 discards") {
    val long = "x" * 256
    assert(Analyzer.tokenize(s"ok $long ok") ==
      Vector(Token("ok", 0), Token("ok", 2)))
    assert(Analyzer.tokenize("y" * 255) == Vector(Token("y" * 255, 0)))
  }

  test("unicode letters tokenized") {
    assert(Analyzer.tokenize("Über straße 東京") ==
      Vector(Token("über", 0), Token("straße", 1), Token("東京", 2)))
  }

  test("null / empty / whitespace") {
    assert(Analyzer.tokenize(null) == Vector.empty)
    assert(Analyzer.tokenize("") == Vector.empty)
    assert(Analyzer.tokenize("  \t\n ") == Vector.empty)
  }

  test("fastTokenize == tokenize on adversarial + random input") {
    val cases = Seq(
      "", " ", "hello world", "O'Brien's dog", "don't stop", "'leading",
      "trailing'", "a''b", "x's", "the a an and", "abc123 45x", "über café",
      "ΣΙΣΥΦΟΣ word", "a" * 300, ("w" * 254) + "'s", "it's it's",
      "tab\tsep\nline", "dots.and,commas;here", "e'e'e'e", "'''", "'s",
      "mix'd CASE Don'T")
    cases.foreach { s =>
      assert(Analyzer.fastTokenize(s) == Analyzer.tokenize(s), s"input=$s")
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ012 '\t.,-ü漢"
    (0 until 500).foreach { _ =>
      val s = (0 until rnd.nextInt(60))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Analyzer.fastTokenize(s) == Analyzer.tokenize(s), s"input=$s")
    }
  }

  test("column expression chain matches the pure function") {
    val spark = SparkFixture.spark
    import spark.implicits._
    val texts = Seq(
      "Hello World", "the quick and the dead", "o'brien's dog's",
      "error 404 in v2", "don't stop", "", "a the to",
      "Mixed CASE with-hyphens and_underscores 42x",
      "x" * 256 + " tail")
    val got = texts.toDF("text")
      .select(posexplode_outer(Analyzer.rawTokensCol(col("text"))).as(Seq("pos", "term")))
      .filter(Analyzer.keepTokenCol(col("term")))
      .as[(Int, String)].collect().toVector
    val want = texts.toVector.flatMap(t => Analyzer.tokenize(t).map(tok => (tok.pos, tok.term)))
    assert(got == want)
  }
}
