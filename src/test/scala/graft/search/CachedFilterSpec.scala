package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.index.IndexBuilder
import graft.model.Transcripts

/** CachingWrapperFilter / FilteredQuery invariants
  * (CachingWrapperFilter.cs:33): one persisted docid set gates many
  * queries; the filter never changes scores, only membership. */
class CachedFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private lazy val idx = IndexBuilder.build(
    Transcripts.synthetic(spark, 800, seed = 3L, partitions = 4), 4)
  private lazy val searcher = new Searcher(idx)

  test("filter gates docids, keeps scores, and is reusable") {
    val f = searcher.cacheFilter(KeywordQ("role", "assistant"))
    try {
      assert(f.bits.storageLevel.useMemory || f.bits.storageLevel.useDisk)
      val allowed = f.bits.collect().map(_.getLong(0)).toSet
      assert(allowed.nonEmpty)

      // reuse across two different scoring queries
      Seq(TermQ("error"): Query,
        BoolQ(should = Seq(TermQ("error"), TermQ("deploy")))).foreach { q =>
        val filtered = searcher.topKFiltered(q, f, 10).collect()
        assert(filtered.nonEmpty)
        assert(filtered.forall(r => allowed(r.getLong(0))))
        // scores are the UNfiltered query's scores (filter gates only)
        val raw = searcher.score(q).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        filtered.foreach(r =>
          assert(math.abs(raw(r.getLong(0)) - r.getDouble(1)) < 1e-12))
        // equals the brute-force restriction
        val brute = searcher.score(q).collect()
          .filter(r => allowed(r.getLong(0)))
          .sortBy(r => (-r.getDouble(1), r.getLong(0))).take(10)
          .map(_.getLong(0)).toSeq
        assert(filtered.map(_.getLong(0)).toSeq == brute)
      }
    } finally f.release()
  }
}
