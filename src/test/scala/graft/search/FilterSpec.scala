package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Filter-algebra spec (contrib Queries family: TermsFilter.cs:52,
  * BooleanFilter.cs:63 + FilterClause, DuplicateFilter.cs:75,
  * QueryWrapperFilter.cs:40) against TinyCorpus' scalar oracle.
  * Filters are pure docid sets — scores of the gated query must be
  * untouched (FilteredQuery semantics). */
class FilterSpec extends AnyFunSuite {
  import TinyCorpus._

  private lazy val searcher = new Searcher(index)

  private def bits(f: DocFilter): Set[Long] =
    searcher.filterBits(f).collect().map(_.getLong(0)).toSet

  // TinyCorpus layout: doc d has role user (d even) / assistant (d odd),
  // conv_id = c(d/4), turn_idx = d%4, tool = None everywhere.
  private val all: Set[Long] = (0L until n.toLong).toSet
  private def users: Set[Long] = all.filter(_ % 2 == 0)

  test("TermsFilter = union of keyword posting sets") {
    assert(bits(TermsF(Seq("role" -> "user"))) == users)
    assert(bits(TermsF(Seq("role" -> "user", "role" -> "assistant"))) == all)
    assert(bits(TermsF(Seq("role" -> "nope"))) == Set.empty[Long])
    assert(bits(TermsF(Nil)) == Set.empty[Long])
  }

  test("QueryWrapperFilter = query match set, scores discarded") {
    val want = (0 until n).filter(d => tf("spark", d) > 0).map(_.toLong).toSet
    assert(bits(QueryF(TermQ("spark"))) == want)
  }

  test("DuplicateFilter keeps one doc per key (first/last)") {
    // conv c000 = docs 0-3, c001 = 4-7, c002 = 8-9
    assert(bits(DuplicateF("conv_id", keepFirst = true)) == Set(0L, 4L, 8L))
    assert(bits(DuplicateF("conv_id", keepFirst = false)) == Set(3L, 7L, 9L))
    // docs without the field are dropped (CorrectBits only sets bits
    // for field-carrying docs): tool is NULL on every TinyCorpus row
    assert(bits(DuplicateF("tool")) == Set.empty[Long])
  }

  test("BooleanFilter: shoulds union, nots subtract, musts intersect") {
    val sparkDocs = (0 until n).filter(d => tf("spark", d) > 0)
      .map(_.toLong).toSet
    val errorDocs = (0 until n).filter(d => tf("error", d) > 0)
      .map(_.toLong).toSet
    val f = BoolF(
      must = Seq(TermsF(Seq("role" -> "user"))),
      should = Seq(QueryF(TermQ("spark")), QueryF(TermQ("error"))),
      mustNot = Seq(QueryF(TermQ("job"))))
    val jobDocs = (0 until n).filter(d => tf("job", d) > 0)
      .map(_.toLong).toSet
    assert(bits(f) == ((sparkDocs ++ errorDocs) -- jobDocs).intersect(users))
  }

  test("BooleanFilter with only NOTs complements against all live docs") {
    val errorDocs = (0 until n).filter(d => tf("error", d) > 0)
      .map(_.toLong).toSet
    assert(bits(BoolF(mustNot = Seq(QueryF(TermQ("error"))))) ==
      all -- errorDocs)
  }

  test("BooleanFilter with only MUSTs intersects them") {
    val sparkDocs = (0 until n).filter(d => tf("spark", d) > 0)
      .map(_.toLong).toSet
    val f = BoolF(must = Seq(QueryF(TermQ("spark")),
      TermsF(Seq("role" -> "user"))))
    assert(bits(f) == sparkDocs.intersect(users))
  }

  test("ChainedFilter: sequential fold with AND/OR/ANDNOT/XOR links") {
    val sparkDocs = (0 until n).filter(d => tf("spark", d) > 0)
      .map(_.toLong).toSet
    val errorDocs = (0 until n).filter(d => tf("error", d) > 0)
      .map(_.toLong).toSet
    def xor(a: Set[Long], b: Set[Long]) = (a ++ b) -- a.intersect(b)
    assert(bits(ChainF(TermsF(Seq("role" -> "user")),
      Seq((ChainXor, QueryF(TermQ("spark")))))) == xor(users, sparkDocs))
    assert(bits(ChainF(QueryF(TermQ("spark")),
      Seq((ChainAndNot, QueryF(TermQ("error")))))) ==
      sparkDocs -- errorDocs)
    assert(bits(ChainF(QueryF(TermQ("spark")),
      Seq((ChainOr, QueryF(TermQ("error"))),
        (ChainAnd, TermsF(Seq("role" -> "user")))))) ==
      (sparkDocs ++ errorDocs).intersect(users))
    // fold is LEFT-associative: (spark XOR error) XOR error == spark
    assert(bits(ChainF(QueryF(TermQ("spark")),
      Seq((ChainXor, QueryF(TermQ("error"))),
        (ChainXor, QueryF(TermQ("error")))))) == sparkDocs)
  }

  test("filtered top-k keeps the unfiltered scores (filter gates only)") {
    val f = searcher.cacheFilter(DuplicateF("conv_id"): DocFilter)
    try {
      val got = searcher.topKFiltered(TermQ("spark"), f, 10).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val keep = Set(3L, 7L, 9L)
      val want = (0 until n)
        .filter(d => tf("spark", d) > 0 && keep(d.toLong))
        .map(d => d.toLong -> bm25("spark", d)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (d, s) =>
        assert(math.abs(s - want(d)) < 1e-9, s"doc $d: got $s want ${want(d)}")
      }
    } finally f.release()
  }
}
