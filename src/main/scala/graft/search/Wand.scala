package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.{InvertedIndex, PostingBlocks}

/** Block-max WAND pruning for top-k disjunctions (Broder et al. CIKM'03;
  * Ding & Suel SIGIR'11 block-max variant), re-expressed for a columnar
  * engine. The reference has only multi-level skip lists
  * (/root/reference/src/core/Index/MultiLevelSkipListWriter.cs:28-65);
  * the north rule asks for block-max WAND — the published-literature
  * upgrade of the same idea: skip whole posting blocks whose score upper
  * bound cannot reach the current top-k threshold.
  *
  * Distributed formulation (no sequential cursor — a two-pass plan):
  *  pass 1 (seed): exact-score the postings of the single term with the
  *    highest block-max bound; its k-th score is a valid LOWER bound T on
  *    the final k-th total score (any doc's total ≥ its single-term
  *    contribution).
  *  pass 2 (prune): a block b of term t can only contain docs with total
  *    score ≤ UB_t(b) + Σ_{t'≠t} gmax_{t'}; if that is < T the whole
  *    block is skipped BEFORE decode (the filter runs on the compressed
  *    block table's stat columns — Parquet row-group pruning applies).
  *  pass 3 (exact): surviving blocks yield candidate docids; candidates
  *    are re-scored against the FULL postings of all query terms, so
  *    returned scores are exact, not truncated.
  *
  * UB_t(b) = idf_t · tfNorm(max_tf(b), min_len(b)) is a true bound:
  * tfNorm is monotone increasing in tf and decreasing in len.
  * Invariant (tested): result set + scores == the unpruned disjunction.
  */
object Wand {

  private final case class Plan(
      live: Seq[String],
      kept: DataFrame,
      totalBlocks: () => Long,
      keptBlocks: () => Long)

  private def plan(idx: InvertedIndex, terms: Seq[String], k: Int): Option[Plan] = {
    val blocks = idx.blocks.getOrElse(
      sys.error("WAND needs a block-backed index (SegmentStore.open)"))
    val spark = blocks.sparkSession
    import spark.implicits._
    val searcher = new Searcher(idx)
    val dfs = searcher.dfOf(terms.toSet)
    val live = terms.distinct.filter(dfs.contains)
    if (live.isEmpty) return None
    val idf = live.map(t => t -> Bm25.idf(idx.numDocs, dfs(t))).toMap

    val idfDf = live.map(t => (t, idf(t))).toDF("term", "idf")
    val withUb = blocks.filter(col("term").isin(live: _*))
      .join(broadcast(idfDf), Seq("term"))
      .withColumn("ub", col("idf") *
        Bm25.tfNorm(col("max_tf").cast("double"),
          col("min_len").cast("double"), idx.avgdl))

    // per-term global max block bound (tiny agg → driver)
    val gmax = withUb.groupBy("term").agg(max(col("ub")).as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sumGmax = gmax.values.sum

    // pass 1: seed threshold from the highest-impact term
    val seed = live.maxBy(gmax)
    val seedScores = searcher.termScores(Set(seed))
      .orderBy(col("tscore").desc).limit(k)
      .collect().map(_.getAs[Double]("tscore"))
    val t0 = if (seedScores.length == k) seedScores.min else 0.0

    // pass 2: per-term block-prune threshold
    val limits = live.map(t => (t, t0 - (sumGmax - gmax(t))))
      .toDF("term", "keep_thresh")
    val kept = withUb.join(broadcast(limits), Seq("term"))
      .filter(col("ub") >= col("keep_thresh"))
      .drop("idf", "ub", "keep_thresh")
    // both counts are DIAGNOSTIC thunks (pruneStats only): the query
    // path must never pay a full block count per query
    Some(Plan(live, kept, () => withUb.count(), () => kept.count()))
  }

  /** Pruned top-k for OR(terms): (docid, score), exact scores. */
  def topKDisjunction(idx: InvertedIndex, terms: Seq[String], k: Int): DataFrame = {
    val spark = idx.blocks.get.sparkSession
    plan(idx, terms, k) match {
      case None =>
        spark.range(0).select(col("id").as("docid"), lit(0.0).as("score"))
      case Some(p) =>
        val candidates = PostingBlocks.toPostings(p.kept)
          .select(col("docid")).distinct()
        // pass 3: exact deterministic rescoring of candidates only
        new Searcher(idx).termScores(p.live.toSet)
          .join(candidates, Seq("docid"), "left_semi")
          .groupBy(col("docid")).agg(
            aggregate(
              sort_array(collect_list(struct(col("term"), col("tscore")))),
              lit(0.0), (acc, x) => acc + x.getField("tscore")).as("score"))
          .orderBy(col("score").desc, col("docid").asc).limit(k)
    }
  }

  /** Diagnostic for the bench: (total blocks, blocks surviving pruning). */
  def pruneStats(idx: InvertedIndex, terms: Seq[String], k: Int): (Long, Long) =
    plan(idx, terms, k) match {
      case None => (0L, 0L)
      case Some(p) => (p.totalBlocks(), p.keptBlocks())
    }
}
