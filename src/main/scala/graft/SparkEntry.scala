package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.StemVectors
import graft.search._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator is declared ONCE as a [[Spec]] (query AST + output
  * shape); the Spark plan and the DuckDB oracle SQL are both generated
  * from that spec ([[Engine]] / [[OracleSql]]), so engine and oracle
  * cannot drift apart.
  */
object SparkEntry {

  sealed trait Spec
  /** BM25 top-k: (rank, docid, score) — TopScoreDocCollector analog. */
  final case class TopK(q: Query, k: Int = 10) extends Spec
  /** Total hit count — TotalHitCountCollector analog. */
  final case class Count(q: Query) extends Spec
  /** Facet counts over a keyword column — SimpleFacetedSearch analog. */
  final case class Facet(q: Query, field: String) extends Spec
  /** Facet counts over the CROSS PRODUCT of ≥2 keyword columns — the
    * reference's multi-group ctor (SimpleFacetedSearch.cs:60 expands
    * all field lists into their value cross product and counts hits
    * per combination). */
  final case class FacetMulti(q: Query, fields: Seq[String]) extends Spec
  /** Raw SQL pair for index-table dumps and non-query ops. */
  final case class Raw(spark: (SparkSession, String) => DataFrame,
      sql: String) extends Spec

  /** Shared template of every ft_stem_* gate: stem a fixed vocabulary
    * with the given stemmer, oracle = the hand-derived vectors frozen
    * as VALUES. One definition; eleven languages. */
  private def stemGate(vectors: Seq[(String, String)],
      stem: String => String): Raw = Raw(
    (s, dir) => {
      import s.implicits._
      vectors.map(_._1).toDF("word")
        .select(col("word"))
        .map(r => (r.getString(0), stem(r.getString(0))))
        .toDF("word", "stem").orderBy("word")
    },
    "SELECT * FROM (VALUES " + vectors.sortBy(_._1)
      .map { case (w, st) => s"('$w', '$st')" }.mkString(", ") +
      ") AS t(word, stem) ORDER BY word")

  /** Registry for the batched multi-query gate (one scan scores all
    * four): AND, msm-OR, boosted bag, and required+excluded — the flat
    * shapes [[Searcher.topKBatch]] accepts. */
  private val BatchRegistry: Seq[(String, BoolQ)] = Seq(
    "q_and" -> BoolQ(must = Seq(TermQ("merge"), TermQ("sort"))),
    "q_msm" -> BoolQ(should = Seq(TermQ("scan"), TermQ("filter"),
      TermQ("window")), minShouldMatch = 2),
    "q_boost" -> BoolQ(should = Seq(BoostQ(TermQ("table"), 2.0),
      TermQ("join"))),
    "q_not" -> BoolQ(must = Seq(TermQ("merge")),
      mustNot = Seq(TermQ("dup"))))

  /** Standing-query registry for the multi-query percolation gates —
    * shapes chosen to exercise term, phrase, keyword-field and msm
    * membership (and single-doc scoring) through BOTH evaluators
    * (MemoryIndex and the SQL pipeline). */
  private val PercolateRegistry: Seq[(String, Query)] = Seq(
    "q_phrase" -> PhraseQ(Seq("key" -> 0, "agg" -> 1)),
    "q_role" -> BoolQ(must = Seq(TermQ("merge"),
      KeywordQ("role", "assistant"))),
    "q_msm" -> BoolQ(should = Seq(TermQ("sort"), TermQ("column"),
      TermQ("row")), minShouldMatch = 2),
    "q_term" -> TermQ("dup"))

  /** The nested-boolean tree the ft_explain_bool gate decomposes (same
    * shape as ft_nested_bool plus a boosted should clause). */
  private val ExplainTreeQ: Query = BoolQ(
    must = Seq(BoolQ(should = Seq(TermQ("scan"), TermQ("filter"))),
      TermQ("row")),
    should = Seq(BoostQ(TermQ("merge"), 1.5)),
    mustNot = Seq(TermQ("dup")))

  /** Every gate TopK query AST — ExplainSpec sweeps these with the
    * CheckHits Explain-equals-Score invariant. */
  def gateTopKQueries: Seq[(String, Query)] =
    ftSpecs.collect { case (n, TopK(q, _)) => (n, q) }

  // ---------------------------------------------------------------------
  // The operator inventory (SURVEY.md §2) as specs
  // ---------------------------------------------------------------------

  private def ftSpecs: Seq[(String, Spec)] = Seq(
    // --- index tables (ingest pipeline §2.3; stored fields §2.1) ---
    "ft_docs" -> Raw(
      (s, dir) => Engine.index(s, dir).docs
        .select("docid", "conv_id", "turn_idx", "role", "tool", "text")
        .orderBy("docid"),
      s"""${OracleSql.prelude}
         |SELECT docid, conv_id, turn_idx, role, tool, text FROM docs
         |ORDER BY docid""".stripMargin),
    "ft_doclens" -> Raw(
      (s, dir) => Engine.index(s, dir).docLens.orderBy("docid"),
      s"""${OracleSql.prelude}
         |SELECT docid, len FROM doclens ORDER BY docid""".stripMargin),
    "ft_dict" -> Raw(
      (s, dir) => Engine.index(s, dir).termDict
        .select("term", "df", "cf").orderBy("term"),
      s"""${OracleSql.prelude}
         |SELECT term, df, cf FROM dict ORDER BY term""".stripMargin),
    // positions serialized as a comma-joined string: the driver's pandas
    // compare can't hash list columns (round-1 gate err), and the string
    // is hash-equivalent for an ordered int array.
    "ft_postings" -> Raw(
      (s, dir) => Engine.index(s, dir).postings
        .select(col("term"), col("docid"), col("tf"), col("len"),
          array_join(col("positions").cast("array<string>"), ",")
            .as("positions")).orderBy("term", "docid"),
      s"""${OracleSql.prelude}
         |SELECT p.term, p.docid, p.tf, l.len,
         |       array_to_string(p.positions, ',') AS positions
         |FROM postings p JOIN doclens l USING (docid)
         |ORDER BY p.term, p.docid""".stripMargin),

    // --- scorer algebra (§2.5) ---
    "ft_term_hot" -> TopK(TermQ("table")),
    "ft_term_rare" -> TopK(TermQ("dup")),
    "ft_term_count" -> Count(TermQ("merge")),
    "ft_bool_and" -> TopK(BoolQ(must = Seq(TermQ("table"), TermQ("merge")))),
    "ft_bool_or_msm" -> TopK(BoolQ(
      should = Seq(TermQ("spark"), TermQ("query"), TermQ("window")),
      minShouldMatch = 2)),
    "ft_bool_not" -> TopK(BoolQ(must = Seq(TermQ("batch")),
      mustNot = Seq(TermQ("slow")))),
    "ft_req_opt" -> TopK(BoolQ(must = Seq(TermQ("join")),
      should = Seq(TermQ("fast")))),
    "ft_nested_bool" -> TopK(BoolQ(
      must = Seq(BoolQ(should = Seq(TermQ("scan"), TermQ("filter"))),
        TermQ("row")),
      mustNot = Seq(TermQ("dup")))),
    "ft_matchall_count" -> Count(MatchAllQ),

    // --- phrases (§2.5 PhraseQuery/SloppyPhraseScorer) ---
    "ft_phrase" -> TopK(PhraseQ(Seq("key" -> 0, "agg" -> 1))),
    "ft_phrase_gap" -> TopK(PhraseQ(Seq("table" -> 0, "merge" -> 2))),
    "ft_phrase_sloppy" -> TopK(PhraseQ(Seq("table" -> 0, "merge" -> 1),
      slop = 3)),
    // N-term + repeated-term sloppy (SloppyPhraseScorer generalization)
    "ft_phrase_sloppy3" -> TopK(PhraseQ(
      Seq("table" -> 0, "merge" -> 1, "batch" -> 2), slop = 4)),
    "ft_phrase_repeat" -> TopK(PhraseQ(Seq("table" -> 0, "table" -> 1),
      slop = 3)),

    // --- multi-term rewrites (§2.5 MultiTermQuery family) ---
    "ft_prefix_count" -> Count(PrefixQ("st")),
    "ft_prefix" -> TopK(BoolQ(must = Seq(PrefixQ("sp"), TermQ("key")))),
    // scoring-boolean + auto rewrites (MultiTermQuery.cs:61-151)
    "ft_prefix_scored" -> TopK(BoolQ(
      must = Seq(PrefixQ("sp", ScoringBoolean), TermQ("key")))),
    "ft_prefix_auto" -> TopK(PrefixQ("qu", AutoRewrite)),
    "ft_wildcard" -> TopK(BoolQ(must = Seq(WildcardQ("s*n"), TermQ("value")))),
    "ft_fuzzy" -> TopK(FuzzyQ("tble", 2)),
    // FuzzyLikeThisQuery (contrib Queries): every term of the free text
    // fuzzified, globally best 8 variants ranked by sim² × source-idf
    "ft_fuzzy_like" -> TopK(FuzzyLikeThisQ("windoow streem tble", 2, 8)),
    "ft_term_range" -> Count(TermRangeQ(Some("query"), Some("sort"))),
    // collated range (TermRangeQuery.cs:96 Collator ctor): the same
    // range under ICU German collation — Spark's collate() and
    // DuckDB's COLLATE both ship ICU, so the gate is fully oracled
    "ft_term_range_coll" -> Count(TermRangeQ(Some("query"), Some("sort"),
      collation = Some("de"))),

    // --- filters / keyword + numeric fields (§2.5 Filter family) ---
    "ft_keyword_role" -> TopK(BoolQ(
      must = Seq(KeywordQ("role", "assistant"), TermQ("table")))),
    "ft_ts_range" -> TopK(BoolQ(must = Seq(
      RangeQ("ts", Some("TIMESTAMP '2025-01-01 02:00:00'"),
        Some("TIMESTAMP '2025-01-01 05:00:00'")),
      TermQ("query")))),

    // --- scoring composition (§2.5 DisMax, boosts, constant score) ---
    "ft_dismax" -> TopK(DisMaxQ(Seq(TermQ("spark"), TermQ("hash")), 0.3)),
    // analyzer-pluggable BUILD (IndexWriter-takes-Analyzer): a whole
    // index built with the Shingle chain, queried by a bigram term;
    // the oracle re-derives the shingled postings and stats in SQL
    "ft_shingle_index" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexAnalyzed(s, dir,
        graft.analysis.Analyzers.Shingles(2)))
        .topK(TermQ("row_column"), 10)),
      OracleSql.shingleTermTopK("row_column", 10)),
    // percolation (contrib Memory / MemoryIndex analog): every doc is
    // matched against ONE registered query by the single-doc evaluator,
    // distributed as a map-only sweep; the oracle is the same query's
    // membership set through the full SQL scoring pipeline — two
    // independent evaluators, one contract
    "ft_percolate" -> Raw(
      (s, dir) => {
        import s.implicits._
        val q: Query = BoolQ(must = Seq(TermQ("table")),
          should = Seq(TermQ("merge"), PrefixQ("so")),
          mustNot = Seq(TermQ("slow")), minShouldMatch = 1)
        Engine.index(s, dir).docs.select(col("docid"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.collect {
            case (d, text) if MemoryIndex.of(text).matches(q) => d
          })
          .toDF("docid").orderBy("docid")
      },
      OracleSql.matchedDocids(BoolQ(must = Seq(TermQ("table")),
        should = Seq(TermQ("merge"), PrefixQ("so")),
        mustNot = Seq(TermQ("slow")), minShouldMatch = 1))),
    // multi-query percolation (the percolator's production shape: a
    // REGISTRY of standing queries swept over the corpus in one map-only
    // pass, one analysis per turn) — oracle = per-query SQL membership
    // sweeps unioned with the query id
    "ft_percolate_multi" -> Raw(
      (s, dir) => graft.streaming.StreamingPercolator.percolate(
          graft.model.Transcripts.fromDocuments(s, dir), PercolateRegistry)
        .orderBy("conv_id", "turn_idx", "query_id"),
      OracleSql.percolateMulti(PercolateRegistry)),
    // SCORED percolation (the reference MemoryIndex.Search float): same
    // registry, every alert ranked by single-doc BM25 — membership via
    // the corpus pipeline, score via the N=1 formula (the length norm
    // cancels), both replayed in SQL
    "ft_percolate_scored" -> Raw(
      (s, dir) => graft.streaming.StreamingPercolator.percolateScored(
          graft.model.Transcripts.fromDocuments(s, dir), PercolateRegistry)
        .select(col("conv_id"), col("turn_idx"), col("query_id"),
          round(col("score"), 4).as("score"))
        .orderBy("conv_id", "turn_idx", "query_id"),
      OracleSql.percolateScored(PercolateRegistry)),
    // WordNet SynExpand analog: "table" expanded with boosted synonyms
    // (flat SHOULD rewrite — the oracle is the expanded boolean itself)
    "ft_synonym" -> TopK(Synonyms.expand("table",
      Map("table" -> Seq("spark", "column")), 0.9)),
    "ft_boost" -> TopK(BoolQ(should = Seq(BoostQ(TermQ("spark"), 2.0),
      TermQ("column")))),
    // BoostingQuery (contrib Queries): "table" hits demoted when the doc
    // also mentions "merge" — soft NOT, never an exclusion
    "ft_boosting" -> TopK(BoostingQ(TermQ("table"), TermQ("merge"), 0.5)),
    // SimilarityQueries.FormSimilarQuery analog: free text → analyzed,
    // deduped SHOULD bag ("the" stopped by the analyzer)
    "ft_similar_text" -> TopK(QueryAst.similarQuery(
      "sort the row by column key sort")),
    "ft_constant_score" -> TopK(BoolQ(
      must = Seq(ConstantScoreQ(PrefixQ("qu"), 0.5), TermQ("line")))),

    // --- collectors / facets / sort (§2.6) ---
    "ft_facet_role" -> Facet(TermQ("table"), "role"),
    // cross-product facets (SimpleFacetedSearch.cs:60 multi-field ctor)
    "ft_facet_multi" -> FacetMulti(TermQ("table"), Seq("role", "tool")),

    // TopFieldCollector / Sort / FieldComparator analog: "latest matching
    // turns by ts" and a two-key (field, score) sort
    "ft_sort_ts" -> Raw(
      (s, dir) => Engine.topKSorted(s, dir, TermQ("table"),
        Seq(SortField("ts", desc = true)), 10),
      OracleSql.topKSorted(TermQ("table"),
        Seq(SortField("ts", desc = true)), 10)),
    "ft_sort_role_score" -> Raw(
      (s, dir) => Engine.topKSorted(s, dir, TermQ("merge"),
        Seq(SortField("role"), SortField("score", desc = true)), 10),
      OracleSql.topKSorted(TermQ("merge"),
        Seq(SortField("role"), SortField("score", desc = true)), 10)),

    // Explain(): per-posting score decomposition; the spec asserts
    // idf * tfnorm == score (CheckHits.cs:41 Explain-vs-Score analog)
    "ft_explain_term" -> Raw(
      (s, dir) => Engine.explainTerm(s, dir, "merge"),
      OracleSql.explainTerm("merge")),
    // Explain() over an arbitrary query TREE: the compositional
    // decomposition's per-doc total must equal the score DuckDB derives
    // independently for the same nested boolean (ExplainSpec additionally
    // sweeps every gate TopK query shape against topK scores)
    "ft_explain_bool" -> Raw(
      (s, dir) => new Searcher(Engine.index(s, dir))
        .explain(ExplainTreeQ)
        .select(col("docid"), round(col("value"), 4).as("value"))
        .orderBy("docid"),
      s"""${OracleSql.prelude}
         |SELECT sq.docid, round(sq.score, 4) AS value
         |FROM ${OracleSql.scoreSql(ExplainTreeQ)} sq
         |ORDER BY sq.docid""".stripMargin),

    // --- contrib Regex / Function / CustomScore queries (§2.5) ---
    "ft_regex" -> TopK(BoolQ(
      must = Seq(RegexQ("s[pt][a-z]+"), TermQ("value")))),
    "ft_function" -> TopK(FunctionQ("CAST(turn_idx AS DOUBLE) * 1.0 + 0.5")),
    "ft_custom_score" -> TopK(
      CustomScoreQ(TermQ("table"), "1.0 + turn_idx / 10.0")),

    // --- span family (§2.5 Spans), MultiPhrase, MoreLikeThis ---
    "ft_span_first" -> TopK(SpanFirstQ("key", 3)),
    "ft_span_near_ord" -> TopK(SpanNearQ("table", "merge", 3, inOrder = true)),
    "ft_span_near_unord" -> TopK(SpanNearQ("table", "merge", 3, inOrder = false)),
    "ft_span_not" -> TopK(SpanNotQ("table", "merge", 4, "key")),
    "ft_span_or" -> TopK(SpanOrQ(Seq("table", "merge", "join"))),
    "ft_multiphrase" -> TopK(MultiPhraseQ(
      Seq(Seq("key", "row") -> 0, Seq("agg", "scan") -> 1))),
    // nested span algebra (one level): near(near(table,merge), batch)
    "ft_span_nested" -> TopK(SpanQ(SNear(Seq(
      SNear(Seq(STerm("table"), STerm("merge")), 2),
      STerm("batch")), 3))),
    "ft_span_nested_not" -> TopK(SpanQ(SNot(
      SNear(Seq(STerm("table"), STerm("merge")), 3), STerm("key")))),
    // N-clause unordered near (NearSpansUnordered.cs:32 envelope
    // semantics) + FieldMaskingSpanQuery analog (keyword field as a
    // width-0 span at position 0 inside the text span algebra)
    "ft_span_unord3" -> TopK(SpanQ(SNear(
      Seq(STerm("table"), STerm("merge"), STerm("key")), 6,
      inOrder = false))),
    // N-clause ORDERED near under the total-gap rule
    // (NearSpansOrdered.cs:47: Σ inter-clause gaps ≤ slop, not each)
    "ft_span_ord3" -> TopK(SpanQ(SNear(
      Seq(STerm("table"), STerm("merge"), STerm("key")), 6,
      inOrder = true))),
    "ft_span_mask" -> TopK(SpanQ(SNear(
      Seq(SMask("role", "assistant"), STerm("table")), 5))),
    // nestable SpanOr (SpanOrQuery.cs:32 inside a near) + SpanRegex
    // (contrib Regex/SpanRegexQuery.cs:33 — regex leaf expands to the
    // SOr of matching dictionary terms, idf summed over the expansion)
    "ft_span_or_nested" -> TopK(SpanQ(SNear(
      Seq(SOr(Seq(STerm("table"), STerm("row"))), STerm("merge")), 3))),
    "ft_span_regex" -> TopK(SpanQ(SNear(
      Seq(SRegex("s(ort|can|park)"), STerm("key")), 4))),
    "ft_mlt" -> TopK(MoreLikeThisQ(7L, 8)),

    // --- MultiFieldQueryParser analog: parser-built AST through the
    // same co-generated spec path (oracle derives from the same AST) ---
    "ft_multifield" -> TopK(QueryParser.parseMultiField(
      "spark role:assistant merge", Seq("text", "role"))),
    // field scope threads into groups: role applies to BOTH disjuncts
    "ft_field_group" -> TopK(QueryParser.parse(
      "role:(tool user) +table merge")),
    // parser date ranges (GetRangeQuery QueryParser.cs:749 +
    // SetDateResolution): endpoints parse as dates/times and become
    // DateTools keys at the field's resolution, evaluated as a
    // lexicographic range over the encoded timestamp
    "ft_parse_daterange" -> TopK(QueryParser.parse(
      "+merge +ts:[2025-01-01T02:00:00 TO 2025-01-01T05:00:00]",
      Map("ts" -> "minute"))),

    // --- highlighter (contrib Highlighter / FastVectorHighlighter) ---
    // best-window snippets over the top-k hits; the tvec variant takes
    // its matches from the term-vectors table (same oracle: position-set
    // marking == token-equality marking for non-stopword query terms)
    "ft_highlight" -> Raw(
      (s, dir) => {
        val idx = Engine.index(s, dir)
        Highlight.highlight(idx, new Searcher(idx),
          BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10)
      },
      OracleSql.highlight(
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10,
        Highlight.Window)),
    "ft_highlight_tvec" -> Raw(
      (s, dir) => Engine.highlightTvec(s, dir,
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10),
      OracleSql.highlight(
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10,
        Highlight.Window)),
    // N-fragment SCORED highlighting (GetBestFragments / FieldFragList):
    // top-3 non-overlapping fragments per hit with their scores, over
    // both the re-analysis and the term-vectors path (one oracle)
    "ft_highlight_multi" -> Raw(
      (s, dir) => {
        val idx = Engine.index(s, dir)
        Highlight.highlightN(idx, new Searcher(idx),
          BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10, 3)
      },
      OracleSql.highlightN(
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10,
        Highlight.Window, 3)),
    "ft_highlight_multi_tvec" -> Raw(
      (s, dir) => Engine.highlightTvecN(s, dir,
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10, 3),
      OracleSql.highlightN(
        BoolQ(should = Seq(TermQ("table"), TermQ("merge"))), 10,
        Highlight.Window, 3)),
    // IDF-WEIGHTED fragment scoring (QueryScorer.cs): fragment score =
    // Σ boost·idf over DISTINCT matched terms, so a lone rare term
    // ("dup", high idf) outranks repeated hot ones ("table", boosted
    // but low idf) — rank-visible exactly where raw hit-count isn't;
    // again over BOTH the re-analysis and the term-vectors path
    "ft_highlight_weighted" -> Raw(
      (s, dir) => {
        val idx = Engine.index(s, dir)
        Highlight.highlightWeighted(idx, new Searcher(idx),
          BoolQ(should = Seq(BoostQ(TermQ("table"), 2.0), TermQ("dup"))),
          10, 3)
      },
      OracleSql.highlightWeighted(
        BoolQ(should = Seq(BoostQ(TermQ("table"), 2.0), TermQ("dup"))),
        10, Highlight.Window, 3)),
    "ft_highlight_weighted_tvec" -> Raw(
      (s, dir) => Engine.highlightTvecWeighted(s, dir,
        BoolQ(should = Seq(BoostQ(TermQ("table"), 2.0), TermQ("dup"))),
        10, 3),
      OracleSql.highlightWeighted(
        BoolQ(should = Seq(BoostQ(TermQ("table"), 2.0), TermQ("dup"))),
        10, Highlight.Window, 3)),

    // --- payload family (PayloadTermQuery + payload functions) ---
    // the payload flavor stores a 2.0 payload on every occurrence at
    // position < 5 (codec payload bit in the position stream); the
    // oracle recomputes the same payloads from raw positions
    "ft_payload_term" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPayload(s, dir))
        .topK(PayloadTermQ("table", PayAvg), 10)),
      OracleSql.payloadTermTopK("table", PayAvg,
        Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = true, 10)),
    "ft_payload_max" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPayload(s, dir))
        .topK(PayloadTermQ("merge", PayMax, includeSpanScore = false), 10)),
      OracleSql.payloadTermTopK("merge", PayMax,
        Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = false, 10)),
    // N-term ordered payload near (PayloadNearQuery over 3 clauses):
    // min-chain per first occurrence, payloads from every chain member
    "ft_payload_near3" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPayload(s, dir))
        .topK(PayloadSpanNearQ(Seq("row", "column", "sort"), 6), 10)),
      OracleSql.payloadSpanNearTopK(Seq("row", "column", "sort"), 6,
        PayAvg, Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = true, 10)),
    // unordered variant: any-order envelopes over the same clauses
    "ft_payload_unord3" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPayload(s, dir))
        .topK(PayloadSpanNearQ(Seq("column", "row", "sort"), 6,
          inOrder = false), 10)),
      OracleSql.payloadSpanNearUnordTopK(Seq("column", "row", "sort"), 6,
        PayAvg, Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = true, 10)),
    // the SAME payload query over the PERSISTED segment store — same
    // oracle as ft_payload_term: storage must be invisible (the payload
    // bit survives shuffle, stitch, and parquet round-trips)
    "ft_payload_seg" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPaySeg(s, dir))
        .topK(PayloadTermQ("table", PayAvg), 10)),
      OracleSql.payloadTermTopK("table", PayAvg,
        Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = true, 10)),
    "ft_payload_near" -> Raw(
      (s, dir) => Engine.ranked(new Searcher(Engine.indexPayload(s, dir))
        .topK(PayloadNearQ("table", "merge", 6), 10)),
      OracleSql.payloadNearTopK("table", "merge", 6, PayAvg,
        Engine.PayloadFirstN, Engine.PayloadBoost.toDouble,
        includeSpanScore = true, 10)),

    // --- cacheable filter (FilteredQuery + CachingWrapperFilter) ---
    // the persisted docid set gates TWO different scoring queries (the
    // reuse CachingWrapperFilter exists for); filters contribute no
    // score. The small per-run persisted set is intentionally not
    // released inside the entry: the returned plan is evaluated lazily
    // by the driver after this function returns.
    "ft_cached_filter" -> Raw(
      (s, dir) => {
        val sr = new Searcher(Engine.index(s, dir))
        val f = sr.cacheFilter(KeywordQ("role", "assistant"))
        Engine.ranked(sr.topKFiltered(TermQ("table"), f, 10))
      },
      OracleSql.topKFiltered(TermQ("table"), "role = 'assistant'", 10)),

    // --- contrib Queries filter algebra (TermsFilter / BooleanFilter /
    // FilterClause / DuplicateFilter / QueryWrapperFilter) — pure
    // docid-set gates, no score contribution ---
    "ft_terms_filter" -> Raw(
      (s, dir) => {
        val sr = new Searcher(Engine.index(s, dir))
        val f = sr.cacheFilter(TermsF(Seq(
          "role" -> "user", "tool" -> "src1")): DocFilter)
        Engine.ranked(sr.topKFiltered(TermQ("table"), f, 10))
      },
      OracleSql.topKFilterSet(TermQ("table"),
        TermsF(Seq("role" -> "user", "tool" -> "src1")), 10)),
    // SHOULD(role=user ∪ role=tool) − NOT(QueryF(term "dup")) ∩
    // MUST(query-match of "scan") — exercises all three clause kinds
    // plus a query-wrapped filter in one tree
    "ft_bool_filter" -> Raw(
      (s, dir) => {
        val sr = new Searcher(Engine.index(s, dir))
        val bf = BoolF(
          must = Seq(QueryF(TermQ("scan"))),
          should = Seq(TermsF(Seq("role" -> "user")),
            TermsF(Seq("role" -> "tool"))),
          mustNot = Seq(QueryF(TermQ("dup"))))
        val f = sr.cacheFilter(bf: DocFilter)
        Engine.ranked(sr.topKFiltered(TermQ("merge"), f, 10))
      },
      OracleSql.topKFilterSet(TermQ("merge"),
        BoolF(
          must = Seq(QueryF(TermQ("scan"))),
          should = Seq(TermsF(Seq("role" -> "user")),
            TermsF(Seq("role" -> "tool"))),
          mustNot = Seq(QueryF(TermQ("dup")))), 10)),
    // sequential filter chain with XOR (contrib Filters/ChainedFilter):
    // (role=user XOR matches-"table") ANDNOT matches-"dup", gating a
    // scored term query — XOR is the shape BoolF cannot express
    "ft_filter_chain" -> Raw(
      (s, dir) => {
        val sr = new Searcher(Engine.index(s, dir))
        val cf = ChainF(TermsF(Seq("role" -> "user")),
          Seq((ChainXor, QueryF(TermQ("table"))),
            (ChainAndNot, QueryF(TermQ("dup")))))
        val f = sr.cacheFilter(cf: DocFilter)
        Engine.ranked(sr.topKFiltered(TermQ("merge"), f, 10))
      },
      OracleSql.topKFilterSet(TermQ("merge"),
        ChainF(TermsF(Seq("role" -> "user")),
          Seq((ChainXor, QueryF(TermQ("table"))),
            (ChainAndNot, QueryF(TermQ("dup"))))), 10)),
    // one doc per conversation (keep the LAST turn, the reference's
    // default KM_USE_LAST_OCCURRENCE) gating a scored term query
    "ft_dup_filter" -> Raw(
      (s, dir) => {
        val sr = new Searcher(Engine.index(s, dir))
        val f = sr.cacheFilter(
          DuplicateF("conv_id", keepFirst = false): DocFilter)
        Engine.ranked(sr.topKFiltered(TermQ("table"), f, 10))
      },
      OracleSql.topKFilterSet(TermQ("table"),
        DuplicateF("conv_id", keepFirst = false), 10)),

    // --- Snowball language analyzers (contrib Snowball / De / Fr) ---
    // Each gate runs one stemmer over a fixed vocabulary against
    // HAND-DERIVED vectors (frozen in the oracle as VALUES — DuckDB has
    // no offline stemmer, and the vectors were traced from the published
    // algorithm on paper, independent of the implementation; same
    // method as SnowballSpec / the Porter paper vectors). One shared
    // [[stemGate]] template so the gate contract cannot diverge per
    // language.
    "ft_stem_de" -> stemGate(StemVectors.german,
      graft.analysis.GermanStemmer.stem),
    // the reference De chain's own (Caumanns) stemmer — vectors frozen
    // from the reference's golden corpus (data.txt)
    "ft_stem_de_ca" -> stemGate(StemVectors.germanCaumanns,
      graft.analysis.CaumannsGermanStemmer.stem),
    // stem-dictionary override + exclusion (DutchStemFilter shape) over
    // the Dutch chain: overrides from the reference's customStemDict
    // fixture, one excluded word, one normally-stemmed word
    "ft_stem_adjust" -> stemGate(
      Seq("lichamelijk" -> "somethingentirelydifferent",
        "lichamelijke" -> "licham", "lichamelijkheden" -> "licham",
        "uitgezonderd" -> "uitgezonderd", "lichamen" -> "licham"),
      w => {
        // drive the REAL StemAdjusted chain (not a re-implementation,
        // so a regression in Analyzers.stemChainOf fails this gate)
        val k = graft.analysis.Analyzers.StemAdjusted(
          graft.analysis.Analyzers.Dutch,
          overrides = Map(
            "lichamelijk" -> "somethingentirelydifferent",
            "lichamelijke" -> "licham", "lichamelijkheden" -> "licham"),
          exclusions = Set("uitgezonderd"))
        graft.analysis.Analyzers.tokenize(k, w)
          .headOption.map(_.term).getOrElse(w)
      }),
    "ft_stem_fr" -> stemGate(StemVectors.french,
      graft.analysis.FrenchStemmer.stem),
    "ft_stem_es" -> stemGate(StemVectors.spanish,
      graft.analysis.SpanishStemmer.stem),
    // typed Classic tokenizer chain over a fixed input set; expected
    // (input, pos, term, type) rows hand-derived and frozen in the
    // oracle as VALUES (same method as the stemmer gates)
    "ft_classic" -> Raw(
      (s, dir) => {
        import s.implicits._
        val inputs = Seq(
          "Mail bob@Example.COM about U.S.A. file",
          "visit www.example.com for 3.14 R2-D2",
          "O'Brien's book and the index")
        inputs.toDF("input")
          .flatMap(r => graft.analysis.Analyzers.classicChain(r.getString(0))
            .map(t => (r.getString(0), t.pos, t.term, t.tpe.toString)))
          .toDF("input", "pos", "term", "type")
          .orderBy("input", "pos")
      }, {
        val expected = Seq(
          ("Mail bob@Example.COM about U.S.A. file",
            Seq((0, "mail", "Alphanum"), (1, "bob@example.com", "Email"),
              (2, "about", "Alphanum"), (3, "usa", "Acronym"),
              (4, "file", "Alphanum"))),
          ("visit www.example.com for 3.14 R2-D2",
            Seq((0, "visit", "Alphanum"), (1, "www.example.com", "Host"),
              // for(2) is in the 33-word stop set -> position gap
              (3, "3.14", "Num"), (4, "r2-d2", "Num"))),
          ("O'Brien's book and the index",
            Seq((0, "o'brien", "Apostrophe"), (1, "book", "Alphanum"),
              (4, "index", "Alphanum")))) // and(2), the(3) stopped
        "SELECT * FROM (VALUES " + expected.flatMap { case (in, toks) =>
          toks.map { case (p, t, ty) =>
            s"('${in.replace("'", "''")}', $p, '${t.replace("'", "''")}', '$ty')"
          }
        }.mkString(", ") +
          ") AS t(input, pos, term, type) ORDER BY input, pos"
      }),
    "ft_stem_it" -> stemGate(StemVectors.italian,
      graft.analysis.ItalianStemmer.stem),
    "ft_stem_sv" -> stemGate(StemVectors.swedish,
      graft.analysis.SwedishStemmer.stem),
    "ft_stem_da" -> stemGate(StemVectors.danish,
      graft.analysis.DanishStemmer.stem),
    "ft_stem_no" -> stemGate(StemVectors.norwegian,
      graft.analysis.NorwegianStemmer.stem),
    "ft_stem_nl" -> stemGate(StemVectors.dutch,
      graft.analysis.DutchStemmer.stem),
    // non-Latin contrib analyzer family (CJK bigrams, Chinese unigrams,
    // Czech/Greek/Persian stop chains, Thai dictionary segmentation,
    // Arabic normalize+light-stem) over fixed inputs; expected
    // (lang, pos, term) rows hand-derived and frozen as VALUES
    "ft_intl" -> Raw(
      (s, dir) => {
        import s.implicits._
        import graft.analysis.Analyzers
        val inputs: Seq[(String, Analyzers.Kind, String)] = Seq(
          ("ar", Analyzers.Arabic, "قرأ الطالب الكتاب في المكتبة"),
          ("cjk", Analyzers.Cjk, "java 一二三四 the 五"),
          ("cs", Analyzers.Czech, "tento dokument je na serveru"),
          ("el", Analyzers.Greek, "Η θάλασσα είναι γαλάζια"),
          ("fa", Analyzers.Persian, "این کتاب از کتابخانه"),
          ("th", Analyzers.Thai, "สวัสดีครับผมชอบอ่านหนังสือ"),
          ("zh", Analyzers.Chinese, "一二三 abc a the"))
        inputs.map { case (lang, _, input) => (lang, input) }.toDF("lang", "input")
          .flatMap { r =>
            val kind = inputs.find(_._1 == r.getString(0)).get._2
            Analyzers.tokenize(kind, r.getString(1))
              .map(t => (r.getString(0), t.pos, t.term))
          }
          .toDF("lang", "pos", "term").orderBy("lang", "pos")
      }, {
        val expected = Seq(
          ("ar", Seq((0, "قرا"), (1, "طالب"), (2, "كتاب"), (4, "مكتب"))),
          ("cjk", Seq((0, "java"), (1, "一二"), (2, "二三"), (3, "三四"),
            (5, "五"))),
          ("cs", Seq((1, "dokument"), (4, "serveru"))),
          ("el", Seq((1, "θαλασσα"), (3, "γαλαζια"))),
          ("fa", Seq((1, "کتاب"), (3, "کتابخانه"))),
          ("th", Seq((0, "สวัสดี"), (1, "ครับ"), (2, "ผม"), (3, "ชอบ"),
            (4, "อ่าน"), (5, "หนังสือ"))),
          ("zh", Seq((0, "一"), (1, "二"), (2, "三"), (3, "abc"))))
        "SELECT * FROM (VALUES " + expected.flatMap { case (lang, toks) =>
          toks.map { case (p, t) => s"('$lang', $p, '$t')" }
        }.mkString(", ") +
          ") AS t(lang, pos, term) ORDER BY lang, pos"
      }),
    // dictionary decompounder (contrib Compound) over fixed inputs
    "ft_decompound" -> Raw(
      (s, dir) => {
        import s.implicits._
        val dict = Set("rind", "fleisch", "schiff", "fahrt", "dampf")
        Seq("the rindfleisch and dampfschiffahrt").toDF("input")
          .flatMap(r => graft.analysis.Analyzers.tokenize(
            graft.analysis.Analyzers.Decompound(dict), r.getString(0))
            .map(t => (t.pos, t.term)))
          .toDF("pos", "term").orderBy("pos", "term")
      },
      "SELECT * FROM (VALUES (1, 'fleisch'), (1, 'rind'), " +
        "(1, 'rindfleisch'), (3, 'dampf'), (3, 'dampfschiffahrt'), " +
        "(3, 'fahrt'), (3, 'schiff')) AS t(pos, term) ORDER BY pos, term"),
    // batched multi-query top-k: one postings scan scores the whole
    // registry; oracle = UNION ALL of the proven per-query topK bodies
    // (per-query rows must equal running each query alone)
    "ft_batch_topk" -> Raw(
      (s, dir) => {
        val idx = Engine.index(s, dir)
        new Searcher(idx).topKBatch(BatchRegistry, 10)
          .select(col("qid"), col("rank"), col("docid"),
            round(col("score"), 4).as("score"))
          .orderBy("qid", "rank")
      },
      OracleSql.topKBatch(BatchRegistry, 10)),
    // the same batch over the PERSISTED block store — storage must be
    // invisible (the ft_seg_* discipline), and the union term set
    // prunes blocks before the decode barrier like any single query
    "ft_batch_topk_seg" -> Raw(
      (s, dir) => {
        val idx = Engine.indexSeg(s, dir)
        new Searcher(idx).topKBatch(BatchRegistry, 10)
          .select(col("qid"), col("rank"), col("docid"),
            round(col("score"), 4).as("score"))
          .orderBy("qid", "rank")
      },
      OracleSql.topKBatch(BatchRegistry, 10)),
    // TeeSink family (contrib Sinks): one classic-chain analysis fans
    // out into date-recognizer / token-range / token-type views
    "ft_tee" -> Raw(
      (s, dir) => {
        import s.implicits._
        Seq("meeting 2025-01-02 bob@example.com 3.14 u.s.a. " +
          "rescheduled 2025-02-03").toDF("input")
          .flatMap(r => graft.analysis.SinkFilters.tee(r.getString(0),
            Seq(
              "dates" -> graft.analysis.SinkFilters.DateSink(),
              "first3" -> graft.analysis.SinkFilters.TokenRangeSink(0, 3),
              "emails" -> graft.analysis.SinkFilters.TokenTypeSink(
                graft.analysis.Analyzers.Email)))
            .map { case (sink, ord, t) => (sink, ord, t.term) })
          .toDF("sink", "ord", "term").orderBy("sink", "ord")
      },
      "SELECT * FROM (VALUES ('dates', 1, '2025-01-02'), " +
        "('dates', 6, '2025-02-03'), ('emails', 2, 'bob@example.com'), " +
        "('first3', 0, 'meeting'), ('first3', 1, '2025-01-02'), " +
        "('first3', 2, 'bob@example.com')) AS t(sink, ord, term) " +
        "ORDER BY sink, ord"),
    // hyphenation decompounder (contrib Compound, Knuth–Liang): spans
    // between hyphenation points only, with the genitive-s retry —
    // "arbeits" misses the dictionary, "arbeit" (one char shorter)
    // hits; 5|10|11 points on the old-orthography ff compound
    "ft_decompound_hyph" -> Raw(
      (s, dir) => {
        import s.implicits._
        val kind = graft.analysis.Analyzers.HyphenDecompound(
          patterns = Seq("f1s", "f1f", "ff1a", "s1p"),
          dict = Set("dampf", "schiff", "fahrt", "dampfschiff",
            "arbeit", "platz"))
        Seq("the dampfschiffahrt and arbeitsplatz").toDF("input")
          .flatMap(r => graft.analysis.Analyzers.tokenize(
            kind, r.getString(0)).map(t => (t.pos, t.term)))
          .toDF("pos", "term").orderBy("pos", "term")
      },
      "SELECT * FROM (VALUES (1, 'dampf'), (1, 'dampfschiff'), " +
        "(1, 'dampfschiffahrt'), (1, 'fahrt'), (1, 'schiff'), " +
        "(3, 'arbeit'), (3, 'arbeitsplatz'), (3, 'platz')) " +
        "AS t(pos, term) ORDER BY pos, term"),
    "ft_stem_pt" -> stemGate(StemVectors.portuguese,
      graft.analysis.PortugueseStemmer.stem),
    // English "Porter2" (the Snowball English chain — distinct from the
    // classic PorterStemFilter algorithm already gated via SnowballSpec)
    "ft_stem_en2" -> stemGate(StemVectors.english,
      graft.analysis.EnglishStemmer.stem),
    // german2 variant: ae/oe/ue folded as umlauts in the prelude
    "ft_stem_de2" -> stemGate(StemVectors.german2,
      graft.analysis.German2Stemmer.stem),
    "ft_stem_ro" -> stemGate(StemVectors.romanian,
      graft.analysis.RomanianStemmer.stem),
    "ft_stem_hu" -> stemGate(StemVectors.hungarian,
      graft.analysis.HungarianStemmer.stem),
    "ft_stem_tr" -> stemGate(StemVectors.turkish,
      graft.analysis.TurkishStemmer.stem),
    // the 1968 Lovins algorithm (longest-match, 29 context conditions,
    // respell transformations)
    "ft_stem_lovins" -> stemGate(StemVectors.lovins,
      graft.analysis.LovinsStemmer.stem),
    // Kraaij-Pohlmann Dutch (ij vowel units, vowel lengthening,
    // ge-prefix/infix removal) — the kp chain, distinct from ft_stem_nl
    "ft_stem_kp" -> stemGate(StemVectors.kp,
      graft.analysis.KpStemmer.stem),
    "ft_stem_br" -> stemGate(StemVectors.brazilian,
      graft.analysis.BrazilianStemmer.stem),
    "ft_stem_fi" -> stemGate(StemVectors.finnish,
      graft.analysis.FinnishStemmer.stem),
    "ft_stem_ru" -> stemGate(StemVectors.russian,
      graft.analysis.RussianStemmer.stem),

    // --- sortable field codecs (Document/DateTools.cs, NumberTools.cs) ---
    // DAY/HOUR-resolution date strings put timestamps into the
    // lexicographic term space; the gate proves the range contract
    // (string BETWEEN == time range) on the transcripts ts field
    "ft_datetools" -> Raw(
      (s, dir) => {
        val t = graft.model.Transcripts.fromDocuments(s, dir)
        t.filter(graft.model.DateTools.dateToString(col("ts"), "hour")
          .between("2025010102", "2025010104"))
          .select(col("conv_id"), col("turn_idx"),
            graft.model.DateTools.dateToString(col("ts"), "minute")
              .as("minute_key"))
          .orderBy("conv_id", "turn_idx")
      },
      s"""WITH ${OracleSql.transcriptsCte}
         |SELECT conv_id, turn_idx,
         |       strftime(ts, '%Y%m%d%H%M') AS minute_key
         |FROM transcripts
         |WHERE strftime(ts, '%Y%m%d%H') BETWEEN '2025010102' AND '2025010104'
         |ORDER BY conv_id, turn_idx""".stripMargin),
    // order-preserving long encoding: result is ordered BY the encoded
    // string, so a hash match proves lexicographic == numeric order and
    // the round-trip, over mixed-sign values
    "ft_numbertools" -> Raw(
      (s, dir) => {
        val v = col("doc_id") * lit(2654435761L) -
          lit(4611686018427387904L)
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), v.as("v"),
            graft.model.NumberTools.longToString(v).as("enc"))
          .withColumn("rt",
            graft.model.NumberTools.stringToLong(col("enc")))
          .orderBy("enc", "doc_id")
      },
      """SELECT doc_id, v,
        |  lpad(CAST(CAST(v AS HUGEINT) + 9223372036854775808 AS VARCHAR),
        |       20, '0') AS enc,
        |  CAST(CAST(lpad(CAST(CAST(v AS HUGEINT) + 9223372036854775808
        |         AS VARCHAR), 20, '0') AS HUGEINT)
        |       - 9223372036854775808 AS BIGINT) AS rt
        |FROM (SELECT doc_id,
        |        doc_id * 2654435761 - 4611686018427387904 AS v
        |      FROM documents)
        |ORDER BY enc, doc_id""".stripMargin),

    // index-derived query stop set (contrib
    // Query/QueryAutoStopWordAnalyzer.cs): terms in > 80% of docs are
    // stopped at query time; the gate verifies the derived set itself
    "ft_autostop" -> Raw(
      (s, dir) => {
        val idx = Engine.index(s, dir)
        val cap = (idx.numDocs * 0.80).toLong
        idx.termDict.filter(col("df") > cap)
          .select(col("term"), col("df")).orderBy("term")
      },
      s"""${OracleSql.prelude}
         |SELECT term, df FROM dict CROSS JOIN stats s
         |WHERE df > CAST(floor(s.n * 0.80) AS BIGINT)
         |ORDER BY term""".stripMargin),

    // leading wildcard via the reversed twin field (contrib
    // Reverse/ReverseStringFilter.cs mechanism): `*er` becomes
    // PrefixQ("re") on a Reversed-analyzed index. Reversal is a term
    // bijection (df/tf/len invariant), so the scored result must equal
    // the oracle's wildcard scoring on the NORMAL terms — which is
    // exactly what the gate compares.
    "ft_reverse_wild" -> Raw(
      (s, dir) => Engine.ranked(
        new Searcher(Engine.indexAnalyzed(s, dir,
          graft.analysis.Analyzers.Reversed))
          .topK(PrefixQ("re", rewrite = ScoringBoolean), 10)),
      s"""${OracleSql.prelude}
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, docid) AS BIGINT) AS rank,
         |       docid, round(score, 4) AS score
         |FROM (SELECT docid, sum(tscore) AS score FROM scored
         |      WHERE term LIKE '%er' GROUP BY docid)
         |ORDER BY score DESC, docid LIMIT 10""".stripMargin),

    // stored-field compression (CompressionTools.cs): the engine
    // compresses + decompresses every doc's bytes and hashes the result;
    // the oracle hashes the original directly — equality proves the
    // round-trip is lossless on real data. Compressed SIZE is a
    // diagnostic, not gated (zlib library versions may differ).
    "ft_compress" -> Raw(
      (s, dir) => {
        val raw = col("text").cast("binary")
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"),
            length(raw).cast("long").as("n_raw"),
            md5(graft.model.CompressionTools.decompressCol(
              graft.model.CompressionTools.compressCol(raw))).as("rt_md5"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_raw,
        |       md5(text) AS rt_md5
        |FROM documents ORDER BY doc_id""".stripMargin),

    // --- pluggable Similarity (Similarity.cs:398-503 strategy) ---
    // classic TF-IDF DefaultSimilarity: tf=sqrt(freq), idf=1+ln(N/(df+1)),
    // lengthNorm=1/sqrt(len) — same query ASTs, swapped strategy; oracle
    // recomputes the classic formula from the shared postings CTEs
    "ft_classic_term" -> Raw(
      (s, dir) => Engine.ranked(
        new Searcher(Engine.index(s, dir), ClassicSim)
          .topK(TermQ("table"), 10)),
      s"""${OracleSql.prelude},
         |cscored AS (
         |  SELECT p.docid,
         |         (1.0 + ln(CAST(s.n AS DOUBLE) / (d.df + 1)))
         |           * (sqrt(p.tf) * (1.0 / sqrt(l.len))) AS score
         |  FROM postings p JOIN dict d USING (term)
         |       JOIN doclens l USING (docid) CROSS JOIN stats s
         |  WHERE p.term = 'table')
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, docid) AS BIGINT) AS rank,
         |       docid, round(score, 4) AS score
         |FROM cscored ORDER BY score DESC, docid LIMIT 10""".stripMargin),
    // coord factor (DefaultSimilarity.Coord:81): SHOULD disjunction score
    // is multiplied by matchedClauses/totalClauses — the slot BM25
    // intentionally leaves identity
    "ft_classic_coord" -> Raw(
      (s, dir) => Engine.ranked(
        new Searcher(Engine.index(s, dir), ClassicSim)
          .topK(BoolQ(should =
            Seq(TermQ("spark"), TermQ("query"), TermQ("window"))), 10)),
      s"""${OracleSql.prelude},
         |cscored AS (
         |  SELECT p.docid,
         |         (1.0 + ln(CAST(s.n AS DOUBLE) / (d.df + 1)))
         |           * (sqrt(p.tf) * (1.0 / sqrt(l.len))) AS score
         |  FROM postings p JOIN dict d USING (term)
         |       JOIN doclens l USING (docid) CROSS JOIN stats s
         |  WHERE p.term IN ('spark', 'query', 'window')),
         |agg AS (
         |  SELECT docid, sum(score) AS s, count(*) AS c
         |  FROM cscored GROUP BY docid)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, docid) AS BIGINT) AS rank,
         |       docid, round(score, 4) AS score
         |FROM (SELECT docid, s * (CAST(c AS DOUBLE) / 3.0) AS score FROM agg)
         |ORDER BY score DESC, docid LIMIT 10""".stripMargin),
    // SmallFloat byte315 norm codec (SmallFloat.cs, Similarity.cs:501-503):
    // hand-derived encode/decode vectors frozen as VALUES (same method as
    // the stemmer gates); round-trip floats written as exact power-of-two
    // arithmetic so both engines produce identical doubles
    "ft_smallfloat" -> Raw(
      (s, dir) => {
        import s.implicits._
        Seq("-3.5", "0.0", "1e-10", "0.25", "0.5", "0.57735026",
          "0.70710678", "1.0", "2.0", "3.0", "5.0", "7.0", "1e10")
          .map { lbl =>
            val b = graft.index.SmallFloat.floatToByte315(lbl.toFloat)
            (lbl, (b & 0xff), graft.index.SmallFloat.decodeNorm(b).toDouble)
          }
          .toDF("f", "b", "rt").orderBy("f")
      },
      """SELECT f, CAST(b AS INTEGER) AS b, CAST(rt AS DOUBLE) AS rt
        |FROM (VALUES
        |  ('-3.5', 0, 0.0), ('0.0', 0, 0.0),
        |  ('1e-10', 1, 1.25 / 2147483648.0),
        |  ('0.25', 116, 0.25), ('0.5', 120, 0.5),
        |  ('0.57735026', 120, 0.5), ('0.70710678', 121, 0.625),
        |  ('1.0', 124, 1.0), ('2.0', 128, 2.0), ('3.0', 130, 3.0),
        |  ('5.0', 133, 5.0), ('7.0', 135, 7.0),
        |  ('1e10', 255, 1.75 * 4294967296.0)
        |) AS t(f, b, rt) ORDER BY f""".stripMargin),

    // --- spell suggest (contrib SpellChecker analog) ---
    "ft_suggest" -> Raw(
      (s, dir) => Suggest.suggest(Engine.index(s, dir), "tble", 2, 5),
      s"""${OracleSql.prelude},
         |${Suggest.oracleSql("tble", 2, 5)}""".stripMargin),
    // pluggable-StringDistance path (StringDistance.cs strategy +
    // SuggestWordQueue score-desc ordering); Levenshtein similarity is
    // the oracle-expressible strategy, JW/NGram are spec-gated on the
    // reference test vectors (StringDistancesSpec)
    "ft_suggest_sim" -> Raw(
      (s, dir) => Suggest.suggestSimilar(Engine.index(s, dir), "tble",
        LevenshteinSim, 0.5, 5),
      s"""${OracleSql.prelude},
         |${Suggest.oracleSqlSimilar("tble", 0.5, 5)}""".stripMargin),

    // --- storage / merge / WAND (§2.1, §2.4; SURVEY §7 steps 3-5, 9) ---
    // Same oracles as the in-memory paths: the compressed block store,
    // the segment manifest, compaction, and docid-re-based appends must
    // all be invisible to query results.
    "ft_seg_docs" -> Raw(
      (s, dir) => Engine.indexSeg(s, dir).docs
        .select("docid", "conv_id", "turn_idx", "role", "tool", "text")
        .orderBy("docid"),
      s"""${OracleSql.prelude}
         |SELECT docid, conv_id, turn_idx, role, tool, text FROM docs
         |ORDER BY docid""".stripMargin),
    "ft_seg_postings" -> Raw(
      (s, dir) => Engine.indexSeg(s, dir).postings
        .select(col("term"), col("docid"), col("tf"), col("len"),
          array_join(col("positions").cast("array<string>"), ",")
            .as("positions")).orderBy("term", "docid"),
      s"""${OracleSql.prelude}
         |SELECT p.term, p.docid, p.tf, l.len,
         |       array_to_string(p.positions, ',') AS positions
         |FROM postings p JOIN doclens l USING (docid)
         |ORDER BY p.term, p.docid""".stripMargin),
    // term-vectors forward table (TermVectorsWriter analog): one doc's
    // vector fetched through the docid-partitioned tvec parquet
    "ft_termvec" -> Raw(
      (s, dir) => Engine.termVectorsOf(s, dir, Seq(7L, 8L))
        .select(col("docid"), col("term"), col("tf"),
          array_join(col("positions").cast("array<string>"), ",")
            .as("positions"))
        .orderBy("docid", "term"),
      s"""${OracleSql.prelude}
         |SELECT docid, term, tf,
         |       array_to_string(positions, ',') AS positions
         |FROM postings WHERE docid IN (7, 8)
         |ORDER BY docid, term""".stripMargin),

    // standalone CheckIndex job: zero violations over the segmented store
    "ft_checkindex" -> Raw(
      (s, dir) => Engine.checkIndexSeg(s, dir),
      s"""${OracleSql.prelude}
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM docs) AS num_docs,
         |       (SELECT CAST(count(*) AS BIGINT) FROM dict) AS num_terms,
         |       CAST(0 AS BIGINT) AS violations""".stripMargin),

    "ft_seg_term" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexSeg(s, dir), TermQ("table"), 10),
      OracleSql.topK(TermQ("table"), 10)),
    // fuzzy through the persisted trigram table (gram-bounded candidate
    // scan — SpellChecker.cs:60 n-gram index shape; same oracle as the
    // full-scan-equivalent ft_fuzzy by the pigeonhole recall guarantee)
    // ("warnimg"~1: both pigeonhole pieces are >= 3 chars, so the
    // gram-bounded path actually engages — "tble"~2's pieces are too
    // short and would fall back to the contains() scan)
    "ft_fuzzy_seg" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexSeg(s, dir),
        FuzzyQ("warnimg", 1), 10),
      OracleSql.topK(FuzzyQ("warnimg", 1), 10)),
    // FuzzyLikeThis through the same trigram path: both source terms'
    // pigeonhole pieces are >= 3 chars, so candidate generation is the
    // gram-bounded scan and the literal rewrite prunes postings blocks
    "ft_fuzzy_like_seg" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexSeg(s, dir),
        FuzzyLikeThisQ("warnimg streem", 1, 8), 10),
      OracleSql.topK(FuzzyLikeThisQ("warnimg streem", 1, 8), 10)),
    "ft_seg_prefix" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexSeg(s, dir),
        BoolQ(must = Seq(PrefixQ("sp"), TermQ("key"))), 10),
      OracleSql.topK(BoolQ(must = Seq(PrefixQ("sp"), TermQ("key"))), 10)),
    "ft_compact_bool" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexCompacted(s, dir),
        BoolQ(must = Seq(TermQ("table"), TermQ("merge"))), 10),
      OracleSql.topK(BoolQ(must = Seq(TermQ("table"), TermQ("merge"))), 10)),
    "ft_append_docs" -> Raw(
      (s, dir) => Engine.indexAppended(s, dir).docs
        .select("docid", "conv_id", "turn_idx", "role", "tool", "text")
        .orderBy("docid"),
      s"""${OracleSql.prelude}
         |SELECT docid, conv_id, turn_idx, role, tool, text FROM docs
         |ORDER BY docid""".stripMargin),
    "ft_append_phrase" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexAppended(s, dir),
        PhraseQ(Seq("key" -> 0, "agg" -> 1)), 10),
      OracleSql.topK(PhraseQ(Seq("key" -> 0, "agg" -> 1)), 10)),
    "ft_wand_or" -> Raw(
      (s, dir) => Engine.topKWand(s, dir, Seq("spark", "hash", "window"), 10),
      OracleSql.topK(BoolQ(should = Seq(TermQ("spark"), TermQ("hash"),
        TermQ("window"))), 10)),

    // --- deletions (§2.3 BufferedDeletes / .del side set) ---
    // Docs containing "dup" deleted; queries hide them, BM25 stats stay
    // stale until merge — both mirrored by the oracle (scored CTE is
    // full-corpus; deleted docids excluded post-scoring).
    "ft_delete_count" -> Raw(
      (s, dir) => {
        import org.apache.spark.sql.functions.{count => cnt, lit}
        Engine.indexDeleted(s, dir).docs.agg(cnt(lit(1)).as("hits"))
      },
      s"""${OracleSql.prelude}
         |SELECT CAST(count(*) AS BIGINT) AS hits FROM docs
         |WHERE docid NOT IN (SELECT docid FROM postings WHERE term = 'dup')""".stripMargin),
    // --- atomic update-by-key (IndexWriter.UpdateDocument analog) ---
    // one conversation replaced (delete set + appended segment in ONE
    // manifest commit): its docs table shows only the NEW docids/text,
    // and the new content ranks under stale-until-merge stats
    "ft_update_docs" -> Raw(
      (s, dir) => Engine.indexUpdated(s, dir).docs
        .filter(col("conv_id") === Engine.UpdatedConv)
        .select("docid", "conv_id", "turn_idx", "text").orderBy("docid"),
      s"""${OracleSql.preludeUpdated(Engine.UpdatedConv, Engine.UpdatedSuffix)}
         |SELECT docid, conv_id, turn_idx, text FROM docs
         |WHERE conv_id = '${Engine.UpdatedConv}'
         |  AND docid NOT IN (SELECT docid FROM delset)
         |ORDER BY docid""".stripMargin),
    "ft_update_term" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexUpdated(s, dir),
        TermQ("updated"), 10),
      s"""${OracleSql.preludeUpdated(Engine.UpdatedConv, Engine.UpdatedSuffix)}
         |SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
         |       sq.docid, round(sq.score, 4) AS score
         |FROM (SELECT docid, tscore AS score FROM scored
         |      WHERE term = 'updated'
         |        AND docid NOT IN (SELECT docid FROM delset)) sq
         |ORDER BY sq.score DESC, sq.docid
         |LIMIT 10""".stripMargin),

    "ft_delete_term" -> Raw(
      (s, dir) => Engine.topKOn(Engine.indexDeleted(s, dir), TermQ("table"), 10),
      s"""${OracleSql.prelude}
         |SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
         |       sq.docid, round(sq.score, 4) AS score
         |FROM (SELECT docid, tscore AS score FROM scored
         |      WHERE term = 'table'
         |        AND docid NOT IN (SELECT docid FROM postings WHERE term = 'dup')) sq
         |ORDER BY sq.score DESC, sq.docid
         |LIMIT 10""".stripMargin),
  )

  private def compile(spec: Spec): ((SparkSession, String) => DataFrame, String) =
    spec match {
      case TopK(q, k) =>
        ((s, dir) => Engine.topK(s, dir, q, k), OracleSql.topK(q, k))
      case Count(q) =>
        ((s, dir) => Engine.countQ(s, dir, q), OracleSql.countQ(q))
      case Facet(q, field) =>
        ((s, dir) => {
          val idx = Engine.index(s, dir)
          new Searcher(idx).score(q)
            .join(idx.docs.select("docid", field), Seq("docid"))
            .groupBy(field).agg(count(lit(1)).as("hits"))
            .orderBy(field)
        },
          s"""${OracleSql.prelude}
             |SELECT d.$field, CAST(count(*) AS BIGINT) AS hits
             |FROM ${OracleSql.scoreSql(q)} sq JOIN docs d ON d.docid = sq.docid
             |GROUP BY d.$field ORDER BY d.$field""".stripMargin)
      case FacetMulti(q, fields) =>
        ((s, dir) => {
          val idx = Engine.index(s, dir)
          new Searcher(idx).score(q)
            .join(idx.docs.select("docid", fields: _*), Seq("docid"))
            .groupBy(fields.head, fields.tail: _*)
            .agg(count(lit(1)).as("hits"))
            .orderBy(fields.head, fields.tail: _*)
        }, {
          val cols = fields.map(f => s"d.$f").mkString(", ")
          s"""${OracleSql.prelude}
             |SELECT $cols, CAST(count(*) AS BIGINT) AS hits
             |FROM ${OracleSql.scoreSql(q)} sq JOIN docs d ON d.docid = sq.docid
             |GROUP BY $cols ORDER BY $cols""".stripMargin
        })
      case Raw(f, sql) => (f, sql)
    }

  private lazy val compiled: Seq[(String, ((SparkSession, String) => DataFrame, String))] =
    ftSpecs.map { case (n, s) => n -> compile(s) } ++
      graft.ops.TrainEntries.entries.map { case (n, f, sql) => n -> (f, sql) }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Engine.topK(spark, "/root/testdata/sf0.001", TermQ("table"), 10)

  /** Operators with no SQL-expressible oracle — the driver records a
    * weaker rows-only check for these. (Empty since round 3: the
    * highlighter window-argmax turned out to be SQL-expressible.) */
  private def noOracleSpecs: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq()

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    compiled.map { case (n, (f, _)) => n -> f }.toMap ++ noOracleSpecs.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    compiled.map { case (n, (_, sql)) => n -> sql }.toMap
}
