package graft.search

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.analysis.Analyzer
import graft.index.{IndexBuilder, InvertedIndex}
import graft.model.TranscriptTurn

/** CheckHits analog (reference test/core/Search/CheckHits.cs:89,197):
  * engine results vs an in-test scalar Scala BM25 oracle — expected docID
  * sets exact, scores within 1e-9 (both sides are doubles over the same
  * math). */
object TinyCorpus {
  val turns: Seq[TranscriptTurn] = Seq(
    "error in the spark job",                      // 0
    "spark spark spark everywhere",                // 1
    "the quick brown fox",                         // 2
    "deploy failed with error",                    // 3
    "quick deploy of the spark table",             // 4
    "a an and are as at be",                       // 5 (all stopwords)
    "error error error error deploy",              // 6
    "fox jumps over the lazy dog",                 // 7
    "spark table merge job",                       // 8
    "merge the table then merge again"             // 9
  ).zipWithIndex.map { case (txt, i) =>
    TranscriptTurn(f"c${i / 4}%03d", i % 4,
      if (i % 2 == 0) "user" else "assistant", txt, None,
      new Timestamp(1735689600000L + i * 1000L))
  }

  // scalar oracle structures
  val docs: Vector[Vector[Analyzer.Token]] =
    turns.sortBy(t => (t.conv_id, t.turn_idx))
      .map(t => Analyzer.tokenize(t.text)).toVector
  val n: Int = docs.size
  val lens: Vector[Int] = docs.map(_.size)
  val avgdl: Double = lens.sum.toDouble / n
  def df(term: String): Int = docs.count(_.exists(_.term == term))
  def tf(term: String, d: Int): Int = docs(d).count(_.term == term)
  def idf(term: String): Double =
    math.log(1.0 + (n - df(term) + 0.5) / (df(term) + 0.5))
  def bm25(term: String, d: Int): Double = {
    val f = tf(term, d)
    if (f == 0) 0.0
    else idf(term) * (f * 2.2) / (f + 1.2 * (1 - 0.75 + 0.75 * lens(d) / avgdl))
  }

  lazy val index: InvertedIndex = {
    val spark = SparkFixture.spark
    import spark.implicits._
    IndexBuilder.build(spark.createDataset(turns).toDF(), 4)
  }
}

class SearcherSpec extends AnyFunSuite {
  import TinyCorpus._

  private def run(q: Query): Map[Long, Double] =
    new Searcher(index).score(q).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def assertScores(got: Map[Long, Double], want: Map[Long, Double]): Unit = {
    assert(got.keySet == want.keySet, s"docID sets differ: got=${got.keySet} want=${want.keySet}")
    got.foreach { case (d, s) =>
      assert(math.abs(s - want(d)) < 1e-9, s"doc $d: got $s want ${want(d)}")
    }
  }

  private def oracleTerm(t: String): Map[Long, Double] =
    (0 until n).filter(d => tf(t, d) > 0)
      .map(d => d.toLong -> bm25(t, d)).toMap

  test("term query matches scalar BM25 oracle") {
    for (t <- Seq("spark", "error", "deploy", "merge", "fox"))
      assertScores(run(TermQ(t)), oracleTerm(t))
  }

  test("term query on absent / stopword term is empty") {
    assert(run(TermQ("zzz")).isEmpty)
    assert(run(TermQ("the")).isEmpty) // stopwords never indexed
  }

  test("docid assignment is dense over (conv_id, turn_idx)") {
    val ids = index.docs.select("docid").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until n.toLong))
    assert(index.numDocs == n)
    assert(math.abs(index.avgdl - avgdl) < 1e-12)
  }

  test("AND = intersection with summed scores") {
    val want = (0 until n)
      .filter(d => tf("spark", d) > 0 && tf("table", d) > 0)
      .map(d => d.toLong -> (bm25("spark", d) + bm25("table", d))).toMap
    assertScores(run(BoolQ(must = Seq(TermQ("spark"), TermQ("table")))), want)
  }

  test("OR = union; minShouldMatch filters") {
    val terms = Seq("error", "deploy")
    val want = (0 until n)
      .filter(d => terms.exists(tf(_, d) > 0))
      .map(d => d.toLong -> terms.map(bm25(_, d)).sum).toMap
    assertScores(run(BoolQ(should = terms.map(TermQ(_)))), want)
    val want2 = (0 until n)
      .filter(d => terms.count(tf(_, d) > 0) >= 2)
      .map(d => d.toLong -> terms.map(bm25(_, d)).sum).toMap
    assertScores(run(BoolQ(should = terms.map(TermQ(_)), minShouldMatch = 2)), want2)
  }

  test("NOT excludes; req+opt adds optional score") {
    val want = (0 until n)
      .filter(d => tf("error", d) > 0 && tf("deploy", d) == 0)
      .map(d => d.toLong -> bm25("error", d)).toMap
    assertScores(run(BoolQ(must = Seq(TermQ("error")),
      mustNot = Seq(TermQ("deploy")))), want)

    val wantRO = (0 until n).filter(d => tf("spark", d) > 0)
      .map(d => d.toLong -> (bm25("spark", d) + bm25("job", d))).toMap
    assertScores(run(BoolQ(must = Seq(TermQ("spark")),
      should = Seq(TermQ("job")))), wantRO)
  }

  test("exact phrase: positions align, stop gaps respected") {
    // "spark table": docs 4 ("...spark table") and 8 ("spark table ...")
    val hits = run(PhraseQ(Seq("spark" -> 0, "table" -> 1)))
    assert(hits.keySet == Set(4L, 8L))
    // "merge <gap> table": doc 9 "merge the table" -> offsets 0,2
    val gap = run(PhraseQ(Seq("merge" -> 0, "table" -> 2)))
    assert(gap.keySet == Set(9L))
    // phrase tf feeds BM25 with summed idf
    val sumIdf = idf("spark") + idf("table")
    val d = 4
    val wantScore = sumIdf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * lens(d) / avgdl))
    assert(math.abs(hits(4L) - wantScore) < 1e-9)
  }

  test("sloppy phrase widens matches") {
    val exact = run(PhraseQ(Seq("deploy" -> 0, "error" -> 1)))
    assert(exact.isEmpty) // "deploy failed with error" has a gap of 3
    // doc 3: "deploy failed with error" (displacement 2);
    // doc 6: "... error deploy" — transposed order costs 2 (Lucene
    // sloppy-phrase semantics: "a b"~2 matches "b a")
    val sloppy = run(PhraseQ(Seq("deploy" -> 0, "error" -> 1), slop = 2))
    assert(sloppy.keySet == Set(3L, 6L))
    // slop=1 reaches neither (both need distance 2)
    assert(run(PhraseQ(Seq("deploy" -> 0, "error" -> 1), slop = 1)).isEmpty)
  }

  test("N-term and repeated-term sloppy phrases") {
    // doc 8 "spark table merge job": exact 3-term chain, total dist 0
    val terms3 = Seq("spark" -> 0, "table" -> 1, "merge" -> 2)
    val hits = run(PhraseQ(terms3, slop = 2))
    assert(hits.keySet == Set(8L))
    val sumIdf = idf("spark") + idf("table") + idf("merge")
    val want = sumIdf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * lens(8) / avgdl))
    assert(math.abs(hits(8L) - want) < 1e-9)
    // repeated term: "spark spark" in doc 1 (positions 0,1,2)
    val rep = run(PhraseQ(Seq("spark" -> 0, "spark" -> 1), slop = 0))
    assert(rep.keySet == Set(1L))
  }

  test("span algebra: nesting, first, not, unordered") {
    // near(near(spark, table, 0), merge, 0): only doc 8 chains 0-1-2
    val nested = run(SpanQ(SNear(Seq(
      SNear(Seq(STerm("spark"), STerm("table")), 0), STerm("merge")), 0)))
    assert(nested.keySet == Set(8L))
    val sumIdf = idf("spark") + idf("table") + idf("merge")
    val want = sumIdf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * lens(8) / avgdl))
    assert(math.abs(nested(8L) - want) < 1e-9)
    // first(near(spark, table)) with end=3: doc 8 span [0,1] yes, doc 4 [4,5] no
    val first = run(SpanQ(SFirst(
      SNear(Seq(STerm("spark"), STerm("table")), 0), 3)))
    assert(first.keySet == Set(8L))
    // not: merge..merge span in doc 9 [0,4] overlaps "table" at 2 -> dropped
    assert(run(SpanQ(SNot(
      SNear(Seq(STerm("merge"), STerm("merge")), 3), STerm("table")))).isEmpty)
    // unordered: table/spark adjacent in either order -> docs 4 and 8
    val unord = run(SpanQ(SNear(Seq(STerm("table"), STerm("spark")), 0,
      inOrder = false)))
    assert(unord.keySet == Set(4L, 8L))
  }

  test("nestable SpanOr: union branches, any-of matching, idf over all branches") {
    // near(or(error, fox), deploy) slop 2: doc 3 "deploy failed with
    // error" has error AFTER deploy (ordered fails), doc 6 "error error
    // error error deploy" chains error->deploy
    val got = run(SpanQ(SNear(Seq(SOr(Seq(STerm("error"), STerm("fox"))),
      STerm("deploy")), 2)))
    assert(got.keySet == Set(6L))
    // idf sums over BOTH or-branches plus the required term
    val sumIdf = idf("error") + idf("fox") + idf("deploy")
    // doc 6 = "error error error error deploy": errors at 1,2,3 chain
    // to deploy at 4 (gap <= 2), greedy min-e per start -> spans of
    // widths e-s = 3,2,1; minW = |requiredLeaves| - 1 = 0
    val tfp = 1.0 / (1 + 3) + 1.0 / (1 + 2) + 1.0 / (1 + 1)
    val want = sumIdf * (tfp * 2.2) /
      (tfp + 1.2 * (1 - 0.75 + 0.75 * lens(6) / avgdl))
    assert(math.abs(got(6L) - want) < 1e-9)
    // a pure SOr tree (no required leaf) matches any-branch docs
    val pure = run(SpanQ(SOr(Seq(STerm("fox"), STerm("lazy")))))
    assert(pure.keySet == Set(2L, 7L))
    // a missing OPTIONAL branch term never empties the result
    val miss = run(SpanQ(SNear(Seq(SOr(Seq(STerm("error"), STerm("zzz"))),
      STerm("deploy")), 2)))
    assert(miss.keySet == Set(6L))
  }

  test("SpanRegex expands to the SOr of matching dictionary terms") {
    val rx = run(SpanQ(SNear(Seq(SRegex("(error|fox)"), STerm("deploy")), 2)))
    val or = run(SpanQ(SNear(Seq(SOr(Seq(STerm("error"), STerm("fox"))),
      STerm("deploy")), 2)))
    assert(rx == or)
    // prefix-pushdown path: pattern with a literal prefix
    val pfx = run(SpanQ(SOr(Seq(SRegex("f(ox|ailed)")))))
    assert(pfx.keySet ==
      (0 until n).filter(d => tf("fox", d) + tf("failed", d) > 0)
        .map(_.toLong).toSet)
  }

  test("prefix / wildcard / fuzzy / range rewrites") {
    assert(run(PrefixQ("dep")).keySet ==
      (0 until n).filter(d => docs(d).exists(_.term.startsWith("dep"))).map(_.toLong).toSet)
    assert(run(WildcardQ("f?x")).keySet == Set(2L, 7L))
    // fuzzy "spork"~1 -> spark
    assert(run(FuzzyQ("spork", 1)).keySet ==
      (0 until n).filter(d => tf("spark", d) > 0).map(_.toLong).toSet)
    assert(run(TermRangeQ(Some("fox"), Some("job"))).keySet ==
      (0 until n).filter(d => docs(d).exists(t => t.term >= "fox" && t.term <= "job")).map(_.toLong).toSet)
  }

  test("scoring-boolean multi-term rewrite sums expanded-term BM25") {
    // prefix "f": fox, failed, ... — per doc the sum over matching terms
    val fTerms = docs.flatMap(_.map(_.term)).distinct.filter(_.startsWith("f"))
    val want = (0 until n)
      .filter(d => fTerms.exists(tf(_, d) > 0))
      .map(d => d.toLong -> fTerms.sorted.map(bm25(_, d)).sum).toMap
    assertScores(run(PrefixQ("f", ScoringBoolean)), want)
    // auto: tiny expansion chooses the scored branch
    assertScores(run(PrefixQ("f", AutoRewrite)), want)
    // constant-score stays uniform
    assert(run(PrefixQ("f")).values.toSet == Set(1.0))
  }

  test("FuzzyLikeThisQ: sim²×source-idf variant ranking, shared df") {
    // scalar replica of FuzzyLikeThisQuery.cs:190-318 over TinyCorpus:
    // "spark" exists in the dictionary (df path), "jog" does not — its
    // variants within 2 edits are job/dog/fox, so df_eff = the INTEGER
    // average (2+1+2)/3 = 1; maxNumTerms=3 must drop the weakest
    // variant (fox, sim 1/3)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def idfOfDf(dfv: Long): Double =
      math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
    def tfNorm(t: String, d: Int): Double = {
      val f = tf(t, d)
      (f * 2.2) / (f + 1.2 * (1 - 0.75 + 0.75 * lens(d) / avgdl))
    }
    val dictTerms = docs.flatten.map(_.term).distinct
    val (text, maxEdits, maxNumTerms) = ("spark jog", 2, 3)
    val srcTerms = Analyzer.analyzeQuery(text).distinct
    val variants = srcTerms.flatMap { src =>
      val cs = dictTerms.map(t => (t, lev(t, src)))
        .filter { case (t, d) =>
          d <= maxEdits && d < math.min(t.length, src.length) } // sim > 0
      val dfEff: Long =
        if (cs.exists(_._1 == src)) df(src).toLong
        else cs.map(c => df(c._1).toLong).sum / cs.size
      cs.map { case (t, d) =>
        val sim = 1.0 - d.toDouble / math.min(t.length, src.length)
        (src, t, sim, sim * sim * idfOfDf(dfEff))
      }.sortBy(c => (-c._3, c._2)).take(Searcher.MaxVariantsPerTerm)
    }
    val sel = variants.sortBy(v => (-v._4, v._2, v._1)).take(maxNumTerms)
    assert(sel.map(_._2).toSet == Set("spark", "job", "dog")) // fox cut
    val want = (0 until n).map { d =>
      d.toLong -> sel.collect { case (_, t, _, vs) if tf(t, d) > 0 =>
        vs * tfNorm(t, d) }.sum
    }.filter(_._2 > 0).toMap
    assertScores(run(FuzzyLikeThisQ(text, maxEdits, maxNumTerms)), want)
  }

  test("dismax = max + tie*(sum-max)") {
    val tie = 0.3
    val terms = Seq("spark", "error")
    val want = (0 until n).filter(d => terms.exists(tf(_, d) > 0)).map { d =>
      val ss = terms.map(bm25(_, d)).filter(_ > 0)
      d.toLong -> (ss.max + tie * (ss.sum - ss.max))
    }.toMap
    assertScores(run(DisMaxQ(terms.map(TermQ(_)), tie)), want)
  }

  test("top-k tie-break is (score desc, docid asc)") {
    val searcher = new Searcher(index)
    val top = searcher.topK(MatchAllQ, 5).collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 2L, 3L, 4L)) // all scores 1.0 -> docid order
  }

  test("field-sorted top-k (TopFieldCollector analog)") {
    val searcher = new Searcher(index)
    // ts desc == docid desc in the fixture (ts = base + i*1000 over the
    // same (conv_id, turn_idx) order)
    val hits = searcher.topKSorted(TermQ("spark"),
      Seq(SortField("ts", desc = true)), 3).collect().map(_.getLong(0)).toSeq
    val want = (0 until n).filter(d => tf("spark", d) > 0)
      .map(_.toLong).sorted.reverse.take(3)
    assert(hits == want)
    // two-key sort: role asc, then score desc
    val rs = searcher.topKSorted(TermQ("error"),
      Seq(SortField("role"), SortField("score", desc = true)), 10)
      .select("docid", "role").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val wantRs = (0 until n).filter(d => tf("error", d) > 0).map { d =>
      (d.toLong, if (d % 2 == 0) "user" else "assistant")
    }.sortBy { case (d, role) => (role, -bm25("error", d.toInt), d) }
    assert(rs == wantRs)
  }

  test("regex / function / custom-score queries") {
    // whole-term regex: sp.* | st.* like terms
    assert(run(RegexQ("f[ao]x")).keySet == Set(2L, 7L))
    assert(run(RegexQ("ox")).isEmpty) // anchored: no substring match
    // top-level alternation: NO required prefix — both branches match
    // (a prefix pushdown keyed on the first branch would drop 'spark')
    assert(run(RegexQ("fox|spark")).keySet ==
      run(RegexQ("fox")).keySet ++ run(TermQ("spark")).keySet)
    assert(Searcher.regexLiteralPrefix("table|merge") == "")
    assert(Searcher.regexLiteralPrefix("tab(le|by)") == "tab")
    assert(Searcher.regexLiteralPrefix("tab[l|b]e") == "tab")
    assert(Searcher.regexLiteralPrefix("ab*c") == "a")
    val f = run(FunctionQ("CAST(turn_idx AS DOUBLE) + 0.5"))
    assert(f.size == n)
    assert(f(0L) == 0.5 && f(3L) == 3.5)
    val cs = run(CustomScoreQ(TermQ("spark"), "1.0 + turn_idx / 10.0"))
    val wantCs = (0 until n).filter(d => tf("spark", d) > 0)
      .map(d => d.toLong -> bm25("spark", d) * (1.0 + (d % 4) / 10.0)).toMap
    assertScores(cs, wantCs)
  }

  test("explain decomposition multiplies back to the score (CheckHits)") {
    val rows = new Searcher(index).explainTerm("spark").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val idfv = r.getAs[Double]("idf")
      val tfn = r.getAs[Double]("tfnorm")
      val s = r.getAs[Double]("score")
      assert(math.abs(idfv * tfn - s) < 2.5e-4) // reference tolerance
      assert(math.abs(s - bm25("spark", r.getAs[Long]("docid").toInt)) < 1e-9)
    }
  }

  test("maxClauseCount is enforced at 1024") {
    val many = (1 to 1025).map(i => TermQ(s"t$i"))
    intercept[IllegalArgumentException] {
      new Searcher(index).score(BoolQ(should = many))
    }
  }

  test("auto stop words derive from index df and strip from queries") {
    import TinyCorpus._
    // scalar oracle: df over the tokenized corpus, threshold 0.25
    val dfm = docs.flatMap(_.map(_.term).distinct)
      .groupBy(identity).map { case (t, xs) => t -> xs.size }
    val cap = (n * 0.25).toLong
    val want = dfm.collect { case (t, df) if df > cap => t }.toSet
    assert(want.nonEmpty && !want.contains("merge")) // merge df=2 stays
    assert(AutoStopWords.stopSet(index, 0.25) == want)
    // a query of only hot terms matches nothing; mixed keeps the rare
    assert(AutoStopWords.query("spark error", want) == MatchNoneQ)
    assert(AutoStopWords.query("spark merge", want) == TermQ("merge"))
    assert(AutoStopWords.query("fox merge jumps", want) ==
      BoolQ(should = Seq(TermQ("fox"), TermQ("merge"), TermQ("jumps"))))
  }

  test("per-turn text equality invariant under stable ordering (north rule)") {
    val fromIndex = index.docs.orderBy("docid")
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    val fromSource = turns.sortBy(t => (t.conv_id, t.turn_idx))
      .map(t => (t.conv_id, t.turn_idx, t.text))
    assert(fromIndex == fromSource)
  }
}
