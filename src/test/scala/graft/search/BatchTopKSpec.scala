package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** The batched multi-query scan must be invisible: for every registry
  * entry, topKBatch's rows equal running topK(q, k) alone — docids in
  * rank order and bit-equal scores (the batch folds each query's
  * clause contributions in the same (occur, index) order the
  * single-query flat path does; 0.0 + x == x makes the group-fold vs
  * flat-fold association identical). */
class BatchTopKSpec extends AnyFunSuite {
  import TinyCorpus._

  private val K = 5

  private def single(q: BoolQ): Seq[(Long, Double)] =
    new Searcher(index).topK(q, K).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def assertBatchMatches(reg: Seq[(String, BoolQ)]): Unit = {
    val batch = new Searcher(index).topKBatch(reg, K).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .groupBy(_._1)
    reg.foreach { case (qid, q) =>
      val got = batch.getOrElse(qid, Array.empty).sortBy(_._2)
        .map(t => (t._3, t._4)).toSeq
      val want = single(q)
      assert(got == want,
        s"$qid: batch=$got single=$want")
      // ranks are 1..n within the query
      assert(batch.getOrElse(qid, Array.empty).map(_._2).sorted.toSeq ==
        (1L to got.size))
    }
    // no stray qids
    assert(batch.keySet.subsetOf(reg.map(_._1).toSet))
  }

  test("fixed registry: AND, msm-OR, boosted bag, req+excl, no-hit") {
    assertBatchMatches(Seq(
      "and" -> BoolQ(must = Seq(TermQ("spark"), TermQ("table"))),
      "msm" -> BoolQ(should = Seq(TermQ("error"), TermQ("deploy"),
        TermQ("merge")), minShouldMatch = 2),
      "boost" -> BoolQ(should = Seq(BoostQ(TermQ("fox"), 3.0),
        TermQ("quick"))),
      "not" -> BoolQ(must = Seq(TermQ("spark")),
        mustNot = Seq(TermQ("job"))),
      "nohit" -> BoolQ(must = Seq(TermQ("zzzznope")))))
  }

  test("randomized flat registries match per-query topK") {
    val pool = Vector("spark", "error", "deploy", "table", "merge",
      "quick", "fox", "job", "dog", "zzzznope")
    val rnd = new scala.util.Random(20260819)
    def pick(n: Int): Seq[Query] =
      Seq.fill(n)(pool(rnd.nextInt(pool.size))).distinct.map { t =>
        if (rnd.nextBoolean()) TermQ(t)
        else BoostQ(TermQ(t), 1 + rnd.nextInt(3).toDouble)
      }
    val reg = (0 until 25).map { i =>
      val must = pick(rnd.nextInt(3))
      val should = pick(1 + rnd.nextInt(3))
      val not = pick(rnd.nextInt(2)).collect { case TermQ(t) => TermQ(t) }
      val msm = rnd.nextInt(should.size + 1)
      s"q$i" -> BoolQ(must = must, should = should, mustNot = not,
        minShouldMatch = msm)
    }
    assertBatchMatches(reg)
  }

  test("non-flat clause is a loud error") {
    val e = intercept[RuntimeException] {
      new Searcher(index).topKBatch(Seq(
        "bad" -> BoolQ(must = Seq(PhraseQ(Seq("spark" -> 0))))), K)
    }
    assert(e.getMessage.contains("flat term-bag"))
  }
}
