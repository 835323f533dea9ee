package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.analysis.Analyzer

/** Logical (table-agnostic) inverted index.
  *
  * One table per concern, mirroring the reference's per-segment files
  * (/root/reference/src/core/Index/IndexFileNames.cs:29-97) as columnar
  * DataFrames:
  *  - docs      — forward/stored fields (.fdt/.fdx analog)
  *  - postings  — (term, docid, tf, len, positions) logical view
  *                (.frq/.prx analog)
  *  - termDict  — (term, df, cf) (.tis/.tii analog; broadcastable)
  *  - docLens   — exact per-doc token counts (exact-int replacement for
  *                the lossy norm byte, Similarity.cs:398-413 — BM25 wants
  *                exact lengths)
  *  - blocks    — optional at-rest compressed form (delta+VByte blocks
  *                with skip/WAND stats); present when opened from a
  *                SegmentStore.
  */
final case class InvertedIndex(
    docs: DataFrame,
    postings: DataFrame,
    termDict: DataFrame,
    docLens: DataFrame,
    numDocs: Long,
    avgdl: Double,
    blocks: Option[DataFrame] = None) {

  /** Postings restricted to a fixed term set. When the index is
    * block-backed, the term predicate is applied to the BLOCK table (a
    * plain Parquet filter → pushdown + row-group pruning) and only
    * surviving blocks are decoded — the decode flatMap is a pushdown
    * barrier, so filtering after decode would read every block
    * (TermInfosReader seek analog,
    * /root/reference/src/core/Index/TermInfosReader.cs:178-196). */
  def postingsFor(terms: Seq[String]): DataFrame = blocks match {
    case Some(b) =>
      PostingBlocks.toPostings(b.filter(col("term").isin(terms: _*)))
    case None => postings.filter(col("term").isin(terms: _*))
  }

  /** Postings for every term matching a dictionary predicate (multi-term
    * rewrites: prefix/wildcard/range/fuzzy — MultiTermQuery.cs:58-200).
    * The matched term set is joined (broadcast) against blocks before
    * decode. */
  def postingsWhereTerm(dictPred: Column): DataFrame = {
    val terms = termDict.filter(dictPred).select("term")
    blocks match {
      case Some(b) =>
        PostingBlocks.toPostings(b.join(broadcast(terms), Seq("term")))
      case None => postings.join(broadcast(terms), Seq("term"))
    }
  }
}

object IndexBuilder {

  /** Tokenize + invert an already-docid'd docs table into
    * (postings, docLens). Pipeline (SURVEY.md §3.1 Spark trace):
    * flatMap-shaped posexplode of the analysis chain → hash aggregation
    * (term,docid → tf + sorted positions). All expressions are Catalyst
    * built-ins (whole-stage codegen; map-side partial aggregation makes
    * the groupBy shuffle only combined partials — the skew-safe two-level
    * combine: the (term,docid) key is never hot even for hot terms). */
  def invert(docs: DataFrame): (DataFrame, DataFrame) = {
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
    (postings, docLens)
  }

  private def dictOf(postings: DataFrame): DataFrame =
    postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** In-memory build (tests / small interactive sessions). */
  def build(transcripts: DataFrame, numPartitions: Int = 32): InvertedIndex = {
    val docs = DocIds.assign(transcripts,
      Seq(col("conv_id"), col("turn_idx")), numPartitions)
    val (postings, docLens) = invert(docs)
    val termDict = dictOf(postings)

    docs.cache(); postings.cache(); docLens.cache(); termDict.cache()

    val Array(n, sumLen) = docLens
      .agg(count(lit(1)), sum(col("len"))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    // integer sum / integer count — exactly reproducible across engines
    InvertedIndex(docs, postings, termDict, docLens, n, sumLen.toDouble / n)
  }

  /** Segmented, resumable build into a SegmentStore.
    *
    * docids are assigned ONCE over the stable (conv_id, turn_idx) global
    * order; segment b owns the contiguous docid range
    * [b·span, (b+1)·span) — so the segmented index is docid-identical to
    * a direct build. Each batch writes a self-contained segment with a
    * lineage marker; a re-run SKIPS completed segments (no re-tokenize —
    * the north rule's checkpoint-resume), then commits one manifest
    * listing all segments (all-or-nothing visibility).
    */
  def buildSegments(spark: SparkSession, transcripts: DataFrame,
      root: String, numBatches: Int = 4, numPartitions: Int = 32): Manifest = {
    val docs = DocIds.assign(transcripts,
      Seq(col("conv_id"), col("turn_idx")), numPartitions)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val total = docs.count()
    val span = math.max(1L, (total + numBatches - 1) / numBatches)
    val metas = (0 until numBatches).flatMap { b =>
      val lo = b * span
      val hi = math.min(total, (b + 1) * span)
      if (lo >= total) None
      else {
        val id = f"seg_b$b%05d"
        val lineage = s"batch=$b/$numBatches docids=[$lo,$hi) src=ingest"
        SegmentStore.readLineage(root, id) match {
          case Some(m) if m.lineage == lineage => Some(m) // resume: skip
          case _ =>
            val slice = docs.filter(col("docid") >= lo && col("docid") < hi)
            val (postings, docLens) = invert(slice)
            val blocks = PostingBlocks.fromPostings(postings, numPartitions)
            val Array(n, sumLen) = docLens
              .agg(count(lit(1)), coalesce(sum(col("len")), lit(0L)))
              .collect()(0) match {
                case r => Array(r.getLong(0), r.getLong(1))
              }
            val meta = SegmentMeta(id, b.toLong, n, sumLen, lineage)
            SegmentStore.writeSegment(root, meta, slice, blocks.toDF(),
              docLens, dictOf(postings))
            Some(meta)
        }
      }
    }
    docs.unpersist(blocking = false)
    val version = SegmentStore.latest(root).map(_.version + 1).getOrElse(1L)
    val m = Manifest(version, metas)
    SegmentStore.commit(root, m)
    m
  }

  /** Append a new batch of turns as one segment, re-basing its docids
    * past the store's current maxDoc — the MergeDocIDRemapper analog
    * (/root/reference/src/core/Index/MergeDocIDRemapper.cs); also the
    * streaming-sink unit (one micro-batch = one segment, SURVEY.md §2.8). */
  def appendSegment(spark: SparkSession, turns: DataFrame, root: String,
      numPartitions: Int = 32): Manifest = {
    val prev = SegmentStore.latest(root)
    val base = prev.map(_.numDocs).getOrElse(0L)
    val nextOrd = prev.flatMap(_.segments.map(_.ord).maxOption)
      .getOrElse(-1L) + 1
    val local = DocIds.assign(turns,
      Seq(col("conv_id"), col("turn_idx")), numPartitions)
    val docs = local.withColumn("docid", col("docid") + lit(base))
    val (postings, docLens) = invert(docs)
    val blocks = PostingBlocks.fromPostings(postings, numPartitions)
    val Array(n, sumLen) = docLens
      .agg(count(lit(1)), coalesce(sum(col("len")), lit(0L)))
      .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
    val id = f"seg_a$nextOrd%05d"
    val meta = SegmentMeta(id, nextOrd, n, sumLen,
      s"append ord=$nextOrd docids=[$base,${base + n})")
    SegmentStore.writeSegment(root, meta, docs, blocks.toDF(), docLens,
      dictOf(postings))
    val m = Manifest(prev.map(_.version + 1).getOrElse(1L),
      prev.map(_.segments).getOrElse(Nil) :+ meta)
    SegmentStore.commit(root, m)
    m
  }

  /** Geometric compaction (LogDocMergePolicy semantics: group segments
    * into log_mergeFactor(numDocs) levels, merge any run of ≥ mergeFactor
    * same-level segments — /root/reference/src/core/Index/LogMergePolicy.cs:50-55,289-296).
    * Merge = union segment tables → range-shuffle re-encode (the
    * SegmentMerger sort-merge, SegmentMerger.cs:676-848, expressed as a
    * shuffle). Global docids make re-basing a no-op here. Returns the new
    * manifest if a merge ran. */
  def compact(spark: SparkSession, root: String, mergeFactor: Int = 10,
      numPartitions: Int = 32): Option[Manifest] = {
    val m = SegmentStore.latest(root).getOrElse(return None)
    if (m.segments.size < 2) return None
    def level(s: SegmentMeta): Int =
      if (s.numDocs <= 1) 0
      else (math.log(s.numDocs.toDouble) / math.log(mergeFactor.toDouble)).toInt
    val byLevel = m.segments.groupBy(level).toSeq.sortBy(-_._1)
    byLevel.collectFirst { case (_, segs) if segs.size >= mergeFactor =>
      doMerge(spark, root, m, segs.sortBy(_.ord).take(mergeFactor),
        numPartitions)
    }
  }

  /** Merge ALL live segments into one (IndexWriter.Optimize analog). */
  def forceMerge(spark: SparkSession, root: String,
      numPartitions: Int = 32): Option[Manifest] = {
    val m = SegmentStore.latest(root).getOrElse(return None)
    if (m.segments.size < 2) return None
    Some(doMerge(spark, root, m, m.segments, numPartitions))
  }

  private def doMerge(spark: SparkSession, root: String, m: Manifest,
      toMerge: Seq[SegmentMeta], numPartitions: Int): Manifest = {
    def unionOf(sub: String): DataFrame =
      toMerge.map(s => spark.read.parquet(s"$root/${s.id}/$sub"))
        .reduce(_ unionByName _)
    val postings = PostingBlocks.toPostings(unionOf("blocks"))
    val blocks = PostingBlocks.fromPostings(postings, numPartitions)
    val newOrd = toMerge.map(_.ord).min
    val id = f"seg_m${m.version + 1}%04d_$newOrd%05d"
    val meta = SegmentMeta(id, newOrd, toMerge.map(_.numDocs).sum,
      toMerge.map(_.sumLen).sum,
      s"merged=[${toMerge.map(_.id).mkString(",")}]")
    SegmentStore.writeSegment(root, meta, unionOf("docs"), blocks.toDF(),
      unionOf("doclens"),
      unionOf("dict").groupBy("term")
        .agg(sum("df").as("df"), sum("cf").as("cf")))
    val merged = toMerge.map(_.id).toSet
    val next = Manifest(m.version + 1,
      (m.segments.filterNot(s => merged.contains(s.id)) :+ meta)
        .sortBy(_.ord))
    SegmentStore.commit(root, next)
    next
  }
}
