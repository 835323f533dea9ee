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

  test("single-doc scoring equals the engine on a singleton corpus") {
    // the reference's own TestMemoryIndex method: the MemoryIndex score
    // must equal a REAL index holding just that document (there,
    // MemoryIndex vs RAMDirectory; here, vs the distributed Searcher —
    // numDocs = 1, df = 1, avgdl = the doc's own length)
    val text = "error in the spark spark job table merge error spark"
    import spark.implicits._
    val one = Seq(graft.model.TranscriptTurn("c0", 0, "user", text, None,
      new java.sql.Timestamp(1735689600000L))).toDS().toDF()
    val idx = IndexBuilder.build(one, 1)
    val sr = new Searcher(idx)
    val mem = MemoryIndex.of(text, fields = Map("role" -> "user"))
    val queries: Seq[Query] = Seq(
      TermQ("spark"), TermQ("error"), TermQ("absent"),
      BoolQ(must = Seq(TermQ("spark"), TermQ("error")),
        should = Seq(TermQ("merge"), TermQ("nope"))),
      BoolQ(should = Seq(TermQ("table"), TermQ("job"), TermQ("nope")),
        minShouldMatch = 2),
      BoolQ(must = Seq(TermQ("spark")), mustNot = Seq(TermQ("nope"))),
      BoolQ(must = Seq(BoolQ(should = Seq(TermQ("job"),
        TermQ("table"))), TermQ("error"))), // nested
      BoostQ(TermQ("spark"), 2.5),
      ConstantScoreQ(TermQ("table"), 3.0),
      DisMaxQ(Seq(TermQ("spark"), TermQ("error"), TermQ("nope")), 0.3),
      PhraseQ(Seq("table" -> 0, "merge" -> 1)),
      PhraseQ(Seq("error" -> 0, "spark" -> 1), slop = 3),
      PhraseQ(Seq("spark" -> 0, "table" -> 1), slop = 4),
      KeywordQ("role", "user"), KeywordQ("role", "assistant"),
      MatchAllQ)
    queries.foreach { q =>
      val engine = sr.score(q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ms = mem.score(q)
      assert(engine.isEmpty == ms.isEmpty, s"$q: engine=$engine mem=$ms")
      ms.foreach(s => assert(math.abs(engine(0L) - s) < 1e-9,
        s"$q: engine=${engine(0L)} mem=$s"))
    }
  }

  test("random query trees: percolation == engine membership (property)") {
    import org.scalacheck.{Gen, rng}
    val t = Transcripts.synthetic(spark, 60, seed = 7L, partitions = 2)
    val idx = IndexBuilder.build(t, 2)
    val sr = new Searcher(idx)
    val docs = idx.docs.select("docid", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val mems = docs.map { case (d, text) => d -> MemoryIndex.of(text) }
    val vocab = docs.flatMap { case (_, text) =>
      graft.analysis.Analyzer.fastTokenize(text).map(_.term)
    }.distinct.sorted.toVector

    val term: Gen[Query] = Gen.oneOf(vocab).map(TermQ(_))
    def leaf: Gen[Query] = Gen.frequency(
      5 -> term,
      1 -> Gen.oneOf(vocab).map(t => PrefixQ(t.take(3))),
      1 -> Gen.oneOf(vocab).map(t => FuzzyQ(t.dropRight(1) + "x", 2)),
      1 -> Gen.oneOf(vocab).map(t =>
        TermRangeQ(Some(t), Some(t + "zz"))),
      1 -> (for (a <- Gen.oneOf(vocab); b <- Gen.oneOf(vocab);
        s <- Gen.chooseNum(0, 4)) yield PhraseQ(Seq(a -> 0, b -> 1), s)))
    def tree(depth: Int): Gen[Query] =
      if (depth == 0) leaf
      else Gen.frequency(
        2 -> leaf,
        3 -> (for {
          nm <- Gen.chooseNum(0, 2); ns <- Gen.chooseNum(0, 3)
          if nm + ns > 0
          m <- Gen.listOfN(nm, tree(depth - 1))
          s <- Gen.listOfN(ns, tree(depth - 1))
          nn <- Gen.chooseNum(0, 1)
          n <- Gen.listOfN(nn, tree(depth - 1))
          msm <- if (ns == 0) Gen.const(0) else Gen.chooseNum(0, ns)
        } yield BoolQ(m, s, n, msm)),
        1 -> Gen.listOfN(2, tree(depth - 1)).map(DisMaxQ(_)))

    // deterministic draws (CodecSpec's pureApply pattern) — retryUntil
    // inside Gen.frequency can fail a draw; just resample on None
    val queries = (0 until 40).flatMap { i =>
      tree(2).apply(Gen.Parameters.default,
        rng.Seed(i.toLong))
    }
    assert(queries.size >= 25, s"only ${queries.size} query trees drawn")
    // storage invisibility under the same random trees: the persisted
    // block SegmentStore must score EXACTLY like the in-memory flavor
    // (docids and doubles — same plans, different physical source)
    val root = java.nio.file.Files
      .createTempDirectory("graft_prop_seg_").toString
    IndexBuilder.buildSegments(spark, t, root, numBatches = 3, 2)
    val segSr = new Searcher(graft.index.SegmentStore.open(spark, root))

    var nonEmpty = 0
    queries.foreach { q =>
      val engine = sr.score(q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val perc = mems.collect { case (d, m) if m.matches(q) => d }.toSet
      assert(perc == engine.keySet,
        s"query $q: percolated $perc != engine ${engine.keySet}")
      val seg = segSr.score(q).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(seg.keySet == engine.keySet, s"query $q: seg docids differ")
      engine.foreach { case (d, s) =>
        assert(math.abs(seg(d) - s) < 1e-9, s"query $q doc $d: seg ${seg(d)} != mem $s")
      }
      if (engine.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty >= 10,
      s"only $nonEmpty of ${queries.size} random trees matched any doc")
  }
}
