package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

import MiscStreams._

/** Reference vectors for the contrib Miscellaneous combinators
  * (test/contrib/Analyzers/Miscellaneous/TestPrefixAwareTokenFilter.cs,
  * TestPrefixAndSuffixAwareTokenFilter.cs, TestEmptyTokenStream.cs,
  * TestSingleTokenTokenFilter.cs — terms + start/end offsets exactly). */
class MiscStreamsSpec extends AnyFunSuite {

  private def terms(ts: Vector[MToken]) = ts.map(_.term)
  private def starts(ts: Vector[MToken]) = ts.map(_.start)
  private def ends(ts: Vector[MToken]) = ts.map(_.end)

  test("PrefixAware: a(0,1) ++ b(0,1) -> b shifted to (1,2)") {
    val ts = prefixAware(singleToken(MToken("a", 0, 1)),
      singleToken(MToken("b", 0, 1)))
    assert(terms(ts) == Vector("a", "b"))
    assert(starts(ts) == Vector(0, 1))
    assert(ends(ts) == Vector(1, 2))
  }

  test("PrefixAware chained twice: ^ hello world $ vectors") {
    val ts1 = prefixAware(singleToken(MToken("^", 0, 0)),
      whitespaceWithOffsets("hello world"))
    val ts = prefixAware(ts1, singleToken(MToken("$", 0, 0)))
    assert(terms(ts) == Vector("^", "hello", "world", "$"))
    assert(starts(ts) == Vector(0, 0, 6, 11))
    assert(ends(ts) == Vector(0, 5, 11, 11))
  }

  test("PrefixAndSuffixAware: ^ hello world $ in one combinator") {
    val ts = prefixAndSuffixAware(
      singleToken(MToken("^", 0, 0)),
      whitespaceWithOffsets("hello world"),
      singleToken(MToken("$", 0, 0)))
    assert(terms(ts) == Vector("^", "hello", "world", "$"))
    assert(starts(ts) == Vector(0, 0, 6, 11))
    assert(ends(ts) == Vector(0, 5, 11, 11))
  }

  test("SingleToken and Empty streams") {
    assert(emptyStream.isEmpty)
    val one = singleToken(MToken("lucene", 0, 6))
    assert(one == Vector(MToken("lucene", 0, 6)))
    // empty prefix leaves the suffix untouched (fresh Token end = 0)
    assert(prefixAware(emptyStream, one) == one)
    // empty suffix is just the prefix
    assert(prefixAware(one, emptyStream) == one)
  }

  test("Injectable update action replaces the offset shift") {
    val ts = injectablePrefixAware(
      singleToken(MToken("pre", 0, 3)),
      singleToken(MToken("suf", 0, 3)),
      (s, p) => s.copy(term = p.term + ":" + s.term))
    assert(terms(ts) == Vector("pre", "pre:suf"))
    assert(starts(ts) == Vector(0, 0)) // the injected action kept offsets
  }
}
