package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** SynExpand invariants (SynExpand.cs:77-130): flat SHOULD expansion,
  * boost only on synonyms, dedup against both query words and earlier
  * synonyms, round-trip through the parquet synonym table. */
class SynonymsSpec extends AnyFunSuite {

  test("expansion: words plain, synonyms boosted, flat SHOULD") {
    val q = Synonyms.expand("big dog",
      Map("big" -> Seq("large"), "dog" -> Seq("hound", "frank")), 0.9)
    assert(q == BoolQ(should = Seq(
      TermQ("big"), BoostQ(TermQ("large"), 0.9),
      TermQ("dog"), BoostQ(TermQ("hound"), 0.9),
      BoostQ(TermQ("frank"), 0.9))))
  }

  test("dedup: a synonym that is a query word or repeats is skipped") {
    val q = Synonyms.expand("big dog",
      Map("big" -> Seq("dog", "large"), "dog" -> Seq("LARGE", "cur")), 0.9)
    // dog (query word) skipped; large added once (case-folded)
    assert(q == BoolQ(should = Seq(
      TermQ("big"), BoostQ(TermQ("large"), 0.9),
      TermQ("dog"), BoostQ(TermQ("cur"), 0.9))))
  }

  test("boost 0 adds synonyms unboosted; stop words drop from the query") {
    val q = Synonyms.expand("the dog", Map("dog" -> Seq("hound")))
    assert(q == BoolQ(should = Seq(TermQ("dog"), TermQ("hound"))))
    // all-stopword input: MatchNoneQ, never a clauseless BoolQ
    assert(Synonyms.expand("the a to", Map("dog" -> Seq("hound")))
      == MatchNoneQ)
  }

  test("synonym table round-trips through parquet") {
    val spark = graft.SparkFixture.spark
    val path = java.nio.file.Files
      .createTempDirectory("graft_syns_").toString + "/syns"
    val m = Map("big" -> Seq("large", "grown"), "dog" -> Seq("hound"))
    Synonyms.write(spark, path, m)
    assert(Synonyms.load(spark, path) == m)
  }
}
