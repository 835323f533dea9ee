package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** EXTERNAL parse-coverage validation: every query string in the
  * reference's own parser-syntax corpus (test/contrib/Memory/
  * testqueries.txt + testqueries2.txt — 109 lines extracted from
  * Lucene's TestQueryParser, exercised by MemoryIndexTest.cs) must
  * parse into a Query AST. Independent of this repo's hand-written
  * parser cases; skipped when the reference checkout is absent.
  * (Engine-vs-MemoryIndex evaluation agreement is covered separately
  * in MemoryIndexSpec.) */
class ParserGoldenSpec extends AnyFunSuite {

  private val base = "/root/reference/test/contrib/Memory"

  test("every reference test query parses") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(base)))
    val qs = Seq("testqueries.txt", "testqueries2.txt").flatMap { f =>
      scala.io.Source.fromFile(s"$base/$f", "UTF-8").getLines().toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    }
    assert(qs.size > 100)
    val failures = qs.flatMap { q =>
      try { QueryParser.parse(q); None }
      catch { case e: Exception => Some(s"'$q' (${e.getMessage})") }
    }
    assert(failures.isEmpty,
      s"${failures.size} of ${qs.size} fail to parse: " +
        failures.take(5).mkString("; "))
  }

  // --- date ranges (GetRangeQuery QueryParser.cs:749) ---

  private val dayRes = Map("ts" -> "day")

  test("date range endpoints become DateTools keys at the field resolution") {
    assert(QueryParser.parse("ts:[2025-01-02 TO 2025-03-04]", dayRes) ===
      DateRangeQ("ts", Some("20250102"), Some("20250304"), "day"))
    // hour resolution: lower at midnight, inclusive upper at 23h
    assert(QueryParser.parse("ts:[2025-01-02 TO 2025-01-03]",
      Map("ts" -> "hour")) ===
      DateRangeQ("ts", Some("2025010200"), Some("2025010323"), "hour"))
  }

  test("exclusive upper bound skips the end-of-day extension") {
    assert(QueryParser.parse("ts:{2025-01-02 TO 2025-01-04}",
      Map("ts" -> "hour")) ===
      DateRangeQ("ts", Some("2025010200"), Some("2025010400"), "hour",
        includeLo = false, includeHi = false))
  }

  test("time-carrying ISO endpoints are taken literally") {
    assert(QueryParser.parse(
      "ts:[2025-01-01T02:00:00 TO 2025-01-01T05:30:00]",
      Map("ts" -> "minute")) ===
      DateRangeQ("ts", Some("202501010200"), Some("202501010530"), "minute"))
  }

  test("open ends and non-date fields keep the term-range path") {
    assert(QueryParser.parse("ts:[* TO 2025-01-02]", dayRes) ===
      DateRangeQ("ts", None, Some("20250102"), "day"))
    // no resolution configured -> analyzed term range, like before
    assert(QueryParser.parse("[query TO sort]", dayRes) ===
      TermRangeQ(Some("query"), Some("sort"), rewrite = AutoRewrite))
    // non-date endpoints on a dated field -> term range fallback
    assert(QueryParser.parse("ts:[abc TO xyz]", dayRes) ===
      TermRangeQ(Some("abc"), Some("xyz"), rewrite = AutoRewrite))
  }
}
