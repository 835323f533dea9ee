package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.index.IndexBuilder
import graft.model.Transcripts

/** Percolation consistency (MemoryIndex.cs analog): for every supported
  * query shape, the single-doc matcher must flag EXACTLY the documents
  * the distributed engine returns — membership semantics are one
  * contract with two evaluators. */
class MemoryIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("single-doc matches agree with the distributed engine") {
    val t = Transcripts.synthetic(spark, 400, seed = 13L, partitions = 2)
    val idx = IndexBuilder.build(t, 2)
    val sr = new Searcher(idx)
    val docs = idx.docs.select("docid", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val mems = docs.map { case (d, text) => d -> MemoryIndex.of(text) }

    // a frequent adjacent KEPT pair of this corpus for phrase/span shapes
    val (a, b) = docs.flatMap { case (_, text) =>
      val ts = graft.analysis.Analyzer.fastTokenize(text).map(_.term)
      ts.zip(ts.drop(1)).filter(p => p._1 != p._2)
    }.groupBy(identity).maxBy(_._2.size)._1

    val queries: Seq[Query] = Seq(
      TermQ("error"),
      BoolQ(must = Seq(TermQ("table")), should = Seq(TermQ("merge")),
        mustNot = Seq(TermQ("stream"))),
      BoolQ(should = Seq(TermQ("query"), TermQ("table"), TermQ("merge")),
        minShouldMatch = 2),
      BoolQ(must = Seq(BoolQ(should = Seq(TermQ("index"), TermQ("batch")))),
        mustNot = Seq(TermQ("deploy"))), // nested
      PhraseQ(Seq(a -> 0, b -> 1)),
      PhraseQ(Seq(a -> 0, b -> 1), slop = 2), // sloppy membership
      BoolQ(must = Seq(TermQ("table")), minShouldMatch = 1), // msm vacuous
      PrefixQ("mer"),
      WildcardQ("qu*ry"),
      RegexQ("err.r"),
      TermRangeQ(Some("table"), Some("tablf")),
      FuzzyQ("tble", 2),
      DisMaxQ(Seq(TermQ("stream"), PhraseQ(Seq(a -> 0, b -> 1)))),
      SpanNearQ(a, b, 3, inOrder = true),
      SpanNearQ(a, b, 3, inOrder = false))

    queries.foreach { q =>
      val engine = sr.score(q).collect().map(_.getLong(0)).toSet
      val percolated = mems.collect { case (d, m) if m.matches(q) => d }.toSet
      assert(percolated == engine, s"query $q")
      assert(engine.nonEmpty, s"query $q matched nothing — weak test")
    }
  }

  test("reference testqueries corpus: percolation == engine membership") {
    val base = "/root/reference/test/contrib/Memory"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(base)))
    val raw = Seq("testqueries.txt", "testqueries2.txt").flatMap { f =>
      scala.io.Source.fromFile(s"$base/$f", "UTF-8").getLines().toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    }
    // corpus built FROM the fixture vocabulary so queries match nonzero
    // docs: every doc is a deterministic slice of the corpus terms
    val vocab = raw.flatMap(q =>
      graft.analysis.Analyzer.fastTokenize(q.toLowerCase).map(_.term))
      .distinct.sorted
    val texts = (0 until 40).map { i =>
      (0 until 6).map(j => vocab((i * 7 + j * 3) % vocab.size))
        .mkString(" ")
    }
    val turns = texts.zipWithIndex.map { case (txt, i) =>
      graft.model.TranscriptTurn(f"c${i / 4}%03d", i % 4,
        if (i % 2 == 0) "user" else "assistant", txt, None,
        java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    }
    import spark.implicits._
    val idx = IndexBuilder.build(spark.createDataset(turns).toDF(), 2)
    val sr = new Searcher(idx)
    val docs = idx.docs.select("docid", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val mems = docs.map { case (d, text) => d -> MemoryIndex.of(text) }

    var checked = 0
    var matchedSomething = 0
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    raw.foreach { qs =>
      try {
        val q = QueryParser.parse(qs)
        val engine = sr.score(q).collect().map(_.getLong(0)).toSet
        val perc = mems.collect { case (d, m) if m.matches(q) => d }.toSet
        assert(perc == engine, s"'$qs' ($q): percolated $perc != $engine")
        checked += 1
        if (engine.nonEmpty) matchedSomething += 1
      } catch {
        // shapes one evaluator cannot express on this schema (unknown
        // field scopes, MatchNone) are skipped, loudly bounded below
        case _: IllegalArgumentException | _: UnsupportedOperationException
          | _: org.apache.spark.sql.AnalysisException => skipped += qs
      }
    }
    assert(checked >= 80, s"only $checked checked; skipped: $skipped")
    assert(matchedSomething >= 40,
      s"only $matchedSomething queries matched any doc — vacuous sweep")
  }

  test("keyword fields and unsupported shapes") {
    val m = MemoryIndex.of("the quick brown fox",
      fields = Map("role" -> "assistant"))
    assert(m.matches(KeywordQ("role", "assistant")))
    assert(!m.matches(KeywordQ("role", "user")))
    assert(!m.matches(KeywordQ("lang", "en")))
    assert(m.matches(BoolQ(must = Seq(TermQ("quick"),
      KeywordQ("role", "assistant")))))
    intercept[UnsupportedOperationException] {
      m.matches(PayloadTermQ("quick"))
    }
  }
}
