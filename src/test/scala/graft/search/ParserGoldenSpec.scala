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
}
