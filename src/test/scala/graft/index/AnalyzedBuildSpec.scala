package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.analysis.{Analyzer, Analyzers, PorterStemmer}
import graft.model.Transcripts
import graft.search.{Searcher, TermQ}

/** Analyzer-pluggable index builds (the IndexWriter-takes-Analyzer
  * contract, IndexWriter.cs:334): the same build pipeline over a
  * non-default chain produces a different term space, and every query
  * path works unchanged — mem and persisted segment flavors agree. */
class AnalyzedBuildSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("shingled build: bigram terms retrieve adjacent-kept-pair docs") {
    val t = Transcripts.synthetic(spark, 400, seed = 3L, partitions = 2)
    val idx = IndexBuilder.build(t, 2, Analyzers.Shingles(2))
    // brute force: adjacent KEPT tokens per doc (stop gaps jumped)
    val docsToks = idx.docs.select("docid", "text").collect()
      .map(r => r.getLong(0) ->
        Analyzer.fastTokenize(r.getString(1)).map(_.term))
    val pair = docsToks.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).maxBy(_._2.size)._1
    val bigram = s"${pair._1}_${pair._2}"
    val want = docsToks.collect {
      case (d, ts) if ts.zip(ts.drop(1)).contains(pair) => d
    }.toSet
    val got = new Searcher(idx).score(TermQ(bigram)).collect()
      .map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("shingled segment store equals the shingled mem flavor") {
    val t = Transcripts.synthetic(spark, 300, seed = 4L, partitions = 2)
    val mem = IndexBuilder.build(t, 2, Analyzers.Shingles(2))
    val root = java.nio.file.Files
      .createTempDirectory("graft_shingleseg_").toString
    IndexBuilder.buildSegments(spark, t, root, numBatches = 2,
      numPartitions = 2, kind = Analyzers.Shingles(2))
    val seg = SegmentStore.open(spark, root)
    val docsToks = mem.docs.select("text").collect()
      .map(r => Analyzer.fastTokenize(r.getString(0)).map(_.term))
    val pair = docsToks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).maxBy(_._2.size)._1
    val q = TermQ(s"${pair._1}_${pair._2}")
    val a = new Searcher(mem).topK(q, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = new Searcher(seg).topK(q, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("English (Porter) build conflates inflected forms") {
    val t = Transcripts.synthetic(spark, 400, seed = 6L, partitions = 2)
    val std = IndexBuilder.build(t, 2)
    val eng = IndexBuilder.build(t, 2, Analyzers.English)
    val docsToks = std.docs.select("text").collect()
      .map(r => Analyzer.fastTokenize(r.getString(0)).map(_.term))
    // pick a raw term whose stem differs (an inflected form exists)
    val raw = docsToks.flatten.distinct
      .find(w => PorterStemmer.stem(w) != w).get
    val stem = PorterStemmer.stem(raw)
    val stdHits = new Searcher(std).score(TermQ(raw)).collect()
      .map(_.getLong(0)).toSet
    val engHits = new Searcher(eng).score(TermQ(stem)).collect()
      .map(_.getLong(0)).toSet
    // every doc with the raw form is reachable via its stem — and the
    // stemmed index may conflate more (other forms of the same stem)
    assert(stdHits.nonEmpty && stdHits.subsetOf(engHits))
  }
}
