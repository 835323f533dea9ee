package graft.search

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.index.IndexBuilder
import graft.model.TranscriptTurn

/** Collated TermRangeQuery (TermRangeQuery.cs:96, the Collator ctor):
  * range enumeration under an ICU locale order must differ from
  * codepoint order exactly where the locale says so — German 'ö'
  * sorts with 'o' (primary level), not after 'z'. */
class CollatedRangeSpec extends AnyFunSuite {

  private lazy val index = {
    val spark = SparkFixture.spark
    import spark.implicits._
    val turns = Seq(
      "öl offen",     // 0: both sort in [oa, pz] under de; öl not in codepoint
      "prüfung zug",  // 1: prüfung in [oa, pz] both ways (ü is not first char)
      "zebra apfel",  // 2: neither in range
      "papier ort"    // 3: both in range both ways
    ).zipWithIndex.map { case (txt, i) =>
      TranscriptTurn(f"c$i%03d", 0, "user", txt, None,
        new Timestamp(1735689600000L + i * 1000L))
    }
    IndexBuilder.build(spark.createDataset(turns).toDF(), 2)
  }

  private def hits(q: Query): Set[Long] = {
    val sr = new Searcher(index)
    sr.topK(q, 10).select("docid").collect().map(_.getLong(0)).toSet
  }

  test("German collation pulls umlaut terms into the range") {
    val coll = hits(TermRangeQ(Some("oa"), Some("pz"),
      collation = Some("de")))
    val plain = hits(TermRangeQ(Some("oa"), Some("pz")))
    // codepoint: öl (U+00F6 > 'z') is OUTSIDE [oa, pz]; ICU de sorts it
    // at primary 'o' — doc 0 matches either way via "offen", so probe
    // with a range that isolates the umlaut term
    val collU = hits(TermRangeQ(Some("og"), Some("oz"),
      collation = Some("de")))
    val plainU = hits(TermRangeQ(Some("og"), Some("oz")))
    assert(collU.contains(0L), "öl must fall in [og, oz] under de")
    assert(!plainU.contains(0L), "öl is past z in codepoint order")
    assert(plainU.contains(3L) && collU.contains(3L)) // ort both ways
    // the wide range agrees on everything whose first letter is ASCII
    assert(coll == plain + 0L || coll == plain,
      s"unexpected divergence: coll=$coll plain=$plain")
  }

  test("MemoryIndex percolation honors the same collation") {
    val mi = MemoryIndex.of("öl kaufen")
    assert(mi.matches(TermRangeQ(Some("og"), Some("oz"),
      collation = Some("de"))))
    assert(!mi.matches(TermRangeQ(Some("og"), Some("oz"))))
  }
}
