package graft

import org.apache.spark.sql.SparkSession

import graft.search._

/** Plan inspector: prints `explain(formatted)` for representative query
  * shapes so pushdown/broadcast/codegen properties can be audited.
  * Usage: graft.Explain [sfDir] — see scripts/explain.sh. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      df.explain("formatted")
    }

    // persisted-store path: the term filter must reach the blocks
    // parquet scan (PushedFilters) BEFORE the decode flatMap
    val seg = Engine.indexSeg(spark, sfDir)
    dump("seg term topK (block pushdown)",
      new Searcher(seg).topK(TermQ("table"), 10))
    dump("seg bool AND", new Searcher(seg)
      .topK(BoolQ(must = Seq(TermQ("table"), TermQ("merge"))), 10))
    dump("WAND disjunction",
      Wand.topKDisjunction(seg, Seq("spark", "hash", "window"), 10))
    // in-memory flavor for comparison
    dump("mem phrase", Engine.searcher(spark, sfDir)
      .topK(PhraseQ(Seq("key" -> 0, "agg" -> 1)), 10))
    // FuzzyLikeThis on the seg store: the literal rewrite means the
    // final postings read must show the selected terms as a pushed
    // isin filter on the blocks scan (not a join-filtered full read)
    dump("seg fuzzy-like-this (literal rewrite pushdown)",
      new Searcher(seg).topK(FuzzyLikeThisQ("warnimg streem", 1, 8), 10))
    // decontamination: the bench gram table must BROADCAST (never a
    // sort-merge join), and the semi filter must precede the count agg
    dump("decontaminate", graft.ops.TrainOps.decontaminate(spark, sfDir))
    // N-term payload near: one postings scan per clause, no extra agg
    dump("payload span-near", new Searcher(Engine.indexPayload(spark, sfDir))
      .topK(PayloadSpanNearQ(Seq("row", "column", "sort"), 6), 10))
    // n-gram Jaccard: every shingle read must come from the cached
    // (InMemoryRelation) table, and the pair-gen join must feed the
    // intersection count directly — no second shingle self-join
    dump("dedup ngram jaccard",
      graft.ops.TrainOps.dedupNgramJaccard(spark, sfDir))
    // embedding-cosine: band self-join on the cached dense-vector table;
    // the cosine is a single projection (zip_with/aggregate), never a
    // per-dim join explosion
    dump("dedup embed cosine",
      graft.ops.TrainOps.dedupEmbedCosine(spark, sfDir))
    // SRP ANN: one map-only signature scan feeding the rescore — no
    // shuffle before the partial top-k
    dump("ann srp", graft.ops.TrainOps.annSrp(spark, sfDir))
    // percolation sweep: a single map-only pass, no shuffle at all
    // before the final ordering
    dump("percolate multi", graft.streaming.StreamingPercolator.percolate(
      graft.model.Transcripts.fromDocuments(spark, sfDir),
      Seq("q" -> TermQ("table"))))
    // stratified sample: the scan's ReadSchema must carry ONLY
    // (source, doc_id) — the hash filter needs no text column
    dump("stratified sample (no text read)", graft.ops.TrainOps
      .stratifiedSample(spark, sfDir, Seq("src3" -> 0.6), 0.25))
    // curation: level-1 window keyed by (source, cell) BEFORE the
    // per-source window — two bounded shuffles, no global sort
    dump("curate top-k (two-level window)",
      graft.ops.TrainOps.curateTopK(spark, sfDir, 3))
    spark.stop()
  }
}
