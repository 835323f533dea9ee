package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Logical (in-memory / table-agnostic) inverted index.
  *
  * One table per concern, mirroring the reference's per-segment files
  * (/root/reference/src/core/Index/IndexFileNames.cs:29-97) as columnar
  * DataFrames:
  *  - docs      — forward/stored fields (.fdt/.fdx analog)
  *  - postings  — (term, docid, tf, positions) (.frq/.prx analog)
  *  - termDict  — (term, df, cf) (.tis/.tii analog; broadcastable)
  *  - docLens   — exact per-doc token counts (exact-int replacement for
  *                the lossy norm byte, Similarity.cs:398-413 — BM25 wants
  *                exact lengths)
  */
final case class InvertedIndex(
    docs: DataFrame,
    postings: DataFrame,
    termDict: DataFrame,
    docLens: DataFrame,
    numDocs: Long,
    avgdl: Double)

object IndexBuilder {

  /** Invert a transcripts DataFrame into the four index tables.
    *
    * Pipeline (SURVEY.md §3.1 Spark trace): assign dense docids →
    * flatMap-shaped posexplode of the analysis chain → two hash
    * aggregations (term,docid → tf+positions; then term → df/cf).
    * All expressions are Catalyst built-ins (whole-stage codegen;
    * map-side partial aggregation makes the groupBys shuffle only
    * combined partials).
    */
  def build(transcripts: DataFrame, numPartitions: Int = 32): InvertedIndex = {
    val docs = DocIds.assign(transcripts,
      Seq(col("conv_id"), col("turn_idx")), numPartitions)

    // 1 row -> N token rows; position = pre-stop-filter index (Lucene
    // position-increment semantics, StopFilter.cs:52).
    val tokens = docs
      .select(col("docid"),
        posexplode(Analyzer.rawTokensCol(col("text"))).as(Seq("pos", "term")))
      .filter(Analyzer.keepTokenCol(col("term")))

    // exact field length per doc; docs whose text is all stopwords get 0
    val docLens = docs.select(col("docid"))
      .join(tokens.groupBy(col("docid")).agg(count(lit(1)).as("len")),
        Seq("docid"), "left")
      .select(col("docid"), coalesce(col("len"), lit(0L)).as("len"))

    // `len` is denormalized into postings (the norms analog lives with the
    // posting, so query-time scoring needs NO join against a per-doc table
    // — at 10^12 docs that join would dominate every query). The docid join
    // here happens once at build time and is co-partitioned with the
    // groupBy's own shuffle.
    val postings = tokens
      .groupBy(col("term"), col("docid"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .join(docLens, Seq("docid"))

    val termDict = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

    docs.cache(); postings.cache(); docLens.cache(); termDict.cache()

    val Array(n, sumLen) = docLens
      .agg(count(lit(1)), sum(col("len"))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    // integer sum / integer count — exactly reproducible across engines
    InvertedIndex(docs, postings, termDict, docLens, n, sumLen.toDouble / n)
  }
}
