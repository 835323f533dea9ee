package graft

import graft.analysis.Analyzer
import graft.search._

/** DuckDB oracle-SQL generator, kept in lockstep with the Spark engine by
  * construction: both sides consume the same [[graft.search.Query]] AST,
  * and the BM25 arithmetic here uses the exact operand order of
  * [[graft.search.Bm25]] (1-ulp libm differences absorbed by round(.,4)).
  *
  * The transcripts CTE mirrors
  * [[graft.model.Transcripts.fromDocuments]] and the token CTEs mirror
  * [[graft.analysis.Analyzer]] (ASCII-equivalent regex — the testdata is
  * lowercase ASCII).
  */
object OracleSql {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private val stopList = Analyzer.StopWordsSeq.map(sq).mkString(", ")

  private[graft] val transcriptsCte: String =
    s"""transcripts AS (
       |  SELECT 'c' || lpad(CAST(doc_id // 8 AS VARCHAR), 6, '0') AS conv_id,
       |         CAST(doc_id % 8 AS INTEGER) AS turn_idx,
       |         CASE WHEN doc_id % 8 = 0 THEN 'system'
       |              WHEN doc_id % 8 = 6 THEN 'tool'
       |              WHEN doc_id % 2 = 1 THEN 'assistant'
       |              ELSE 'user' END AS role,
       |         text,
       |         CASE WHEN doc_id % 8 = 6 THEN source ELSE NULL END AS tool,
       |         TIMESTAMP '2025-01-01 00:00:00' + CAST(doc_id AS INTEGER) * INTERVAL 1 MINUTE AS ts
       |  FROM documents)""".stripMargin

  /** Analysis chain + stats + scores over whatever `docs` CTE precedes. */
  private val analysisCtes: String =
    s"""rawtok AS (
       |  SELECT docid,
       |         list_transform(regexp_extract_all(lower(text), '[a-z0-9]+(''[a-z0-9]+)*'),
       |                        s -> regexp_replace(s, '''s$$', '')) AS toks
       |  FROM docs),
       |tok AS (
       |  SELECT docid, CAST(pos - 1 AS INTEGER) AS pos, toks[pos] AS term
       |  FROM (SELECT docid, toks, generate_subscripts(toks, 1) AS pos FROM rawtok)
       |  WHERE toks[pos] NOT IN ($stopList)
       |    AND length(toks[pos]) <= 255 AND length(toks[pos]) > 0),
       |postings AS (
       |  SELECT term, docid, CAST(count(*) AS BIGINT) AS tf,
       |         list_sort(list(pos)) AS positions
       |  FROM tok GROUP BY term, docid),
       |doclens AS (
       |  SELECT d.docid, CAST(coalesce(t.len, 0) AS BIGINT) AS len
       |  FROM docs d LEFT JOIN (SELECT docid, count(*) AS len FROM tok GROUP BY docid) t USING (docid)),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(len) AS DOUBLE) / count(*) AS avgdl
       |  FROM doclens),
       |dict AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
       |  FROM postings GROUP BY term),
       |scored AS (
       |  SELECT p.term, p.docid, p.tf, p.positions, l.len, s.avgdl, s.n,
       |         ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
       |           * (p.tf * 2.2) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.len / s.avgdl)) AS tscore
       |  FROM postings p JOIN dict d USING (term)
       |       JOIN doclens l USING (docid) CROSS JOIN stats s)""".stripMargin

  /** Shared prelude: transcripts derivation, docid assignment, analysis
    * chain, postings, doc lengths, collection stats, term dictionary,
    * per-(term,docid) BM25 partial scores. */
  val prelude: String =
    s"""WITH $transcriptsCte,
       |docs AS (
       |  SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS docid,
       |         conv_id, turn_idx, role, text, tool, ts
       |  FROM transcripts),
       |$analysisCtes""".stripMargin

  /** Prelude for the ATOMIC-UPDATE flavor: conv `conv`'s original docs
    * are in the delete set (`delset`) and a re-analyzed replacement copy
    * (text + `suffix`) is appended past the docid watermark. Stats are
    * STALE-inclusive (deleted docs still counted, appended docs added) —
    * exactly the engine's manifest arithmetic; queries exclude `delset`
    * post-scoring like ft_delete_*. */
  def preludeUpdated(conv: String, suffix: String): String =
    s"""WITH $transcriptsCte,
       |docs0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS docid,
       |         conv_id, turn_idx, role, text, tool, ts
       |  FROM transcripts),
       |appended AS (
       |  SELECT (SELECT max(docid) FROM docs0)
       |           + CAST(row_number() OVER (ORDER BY conv_id, turn_idx) AS BIGINT) AS docid,
       |         conv_id, turn_idx, role, text || ${sq(suffix)} AS text, tool, ts
       |  FROM transcripts WHERE conv_id = ${sq(conv)}),
       |docs AS (SELECT * FROM docs0 UNION ALL SELECT * FROM appended),
       |delset AS (SELECT docid FROM docs0 WHERE conv_id = ${sq(conv)}),
       |$analysisCtes""".stripMargin

  /** Summed idf of a term multiset (phrase weight), duplicates kept. */
  private def sumIdfSql(terms: Seq[String]): String = {
    val vals = terms.map(t => s"(${sq(t)})").mkString(", ")
    s"""(SELECT sum(ln(1.0 + (CAST(st.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)))
       | FROM (VALUES $vals) q(t) JOIN dict d ON d.term = q.t CROSS JOIN stats st)""".stripMargin
  }

  private var aliasCounter = 0
  private def al(): String = synchronized { aliasCounter += 1; s"q$aliasCounter" }

  /** Multi-term rewrite mirror (MultiTermQuery.cs:58-200). The auto
    * heuristic is replayed IN SQL (CASE on the matched-term count), so
    * the oracle picks the same branch the engine picked on any data. */
  private def multiTermSql(termPred: String, rw: MultiTermRewrite): String =
    rw match {
      case ConstantScore =>
        s"""(SELECT DISTINCT docid, 1.0 AS score FROM postings
           | WHERE $termPred)""".stripMargin
      case ScoringBoolean =>
        s"""(SELECT docid, sum(tscore) AS score FROM scored
           | WHERE $termPred GROUP BY docid)""".stripMargin
      case AutoRewrite =>
        s"""(SELECT docid,
           |   CASE WHEN (SELECT count(*) FROM dict WHERE $termPred)
           |          <= ${Searcher.AutoRewriteTermCap}
           |        THEN sum(tscore) ELSE 1.0 END AS score
           | FROM scored WHERE $termPred GROUP BY docid)""".stripMargin
    }

  /** Derived table producing (docid, score), mirroring Searcher.score. */
  def scoreSql(q: Query): String = q match {
    case TermQ(t) =>
      s"(SELECT docid, tscore AS score FROM scored WHERE term = ${sq(t)})"

    case BoolQ(must, should, mustNot, msm) =>
      val a = al()
      def union(cs: Seq[Query]): String =
        cs.map(c => s"SELECT docid, score FROM ${scoreSql(c)} ${al()}")
          .mkString(" UNION ALL ")
      val notFilter =
        if (mustNot.isEmpty) ""
        else s" WHERE $a.docid NOT IN (SELECT docid FROM (${union(mustNot)}) ${al()})"
      val inner =
        if (must.nonEmpty && should.nonEmpty)
          s"""SELECT m.docid, m.score + coalesce(s.sscore, 0.0) AS score
             | FROM (SELECT docid, sum(score) AS score FROM (${union(must)}) ${al()}
             |       GROUP BY docid HAVING count(*) = ${must.size}) m
             | LEFT JOIN (SELECT docid, sum(score) AS sscore, count(*) AS scnt
             |            FROM (${union(should)}) ${al()} GROUP BY docid) s ON s.docid = m.docid
             | WHERE coalesce(s.scnt, 0) >= $msm""".stripMargin
        else if (must.nonEmpty)
          s"""SELECT docid, sum(score) AS score FROM (${union(must)}) ${al()}
             | GROUP BY docid HAVING count(*) = ${must.size}""".stripMargin
        else
          s"""SELECT docid, sum(score) AS score FROM (${union(should)}) ${al()}
             | GROUP BY docid HAVING count(*) >= ${math.max(1, msm)}""".stripMargin
      s"(SELECT $a.docid, $a.score FROM ($inner) $a$notFilter)"

    case PhraseQ(terms, 0) =>
      val conds = terms.zipWithIndex.tail.map { case ((_, offk), k) =>
        s"list_contains(p$k.positions, p + ${offk - terms.head._2})"
      }
      val lam = if (conds.isEmpty) "p -> true" else s"p -> ${conds.mkString(" AND ")}"
      val joins = terms.zipWithIndex.tail.map { case ((t, _), k) =>
        s"JOIN scored p$k ON p$k.docid = p0.docid AND p$k.term = ${sq(t)}"
      }.mkString(" ")
      s"""(SELECT j.docid,
         |   ${sumIdfSql(terms.map(_._1))} * (j.tfp * 2.2)
         |     / (j.tfp + 1.2 * (1.0 - 0.75 + 0.75 * j.len / j.avgdl)) AS score
         | FROM (SELECT p0.docid, p0.len, p0.avgdl,
         |              CAST(len(list_filter(p0.positions, $lam)) AS DOUBLE) AS tfp
         |       FROM scored p0 $joins WHERE p0.term = ${sq(terms.head._1)}) j
         | WHERE j.tfp > 0)""".stripMargin

    case PhraseQ(terms, slop) =>
      // N-term sloppy mirror of Searcher.phrase: per slot-0 position,
      // each slot's min |displacement| (candidates <= slop); contribute
      // 1/(total+1) when the summed displacement stays within slop
      val off0 = terms.head._2
      val joins = terms.zipWithIndex.tail.map { case ((t, offk), k) =>
        val g = offk - off0
        s"JOIN tok b$k ON b$k.docid = a.docid AND b$k.term = ${sq(t)}" +
          s" AND abs((b$k.pos - a.pos) - $g) <= $slop"
      }.mkString(" ")
      val mins = terms.zipWithIndex.tail.map { case ((_, offk), k) =>
        val g = offk - off0
        s"CAST(min(abs((b$k.pos - a.pos) - $g)) AS DOUBLE) AS m$k"
      }.mkString(", ")
      val total = terms.zipWithIndex.tail.map { case (_, k) => s"m$k" }
        .mkString(" + ")
      s"""(SELECT g.docid,
         |   ${sumIdfSql(terms.map(_._1))} * (g.tfp * 2.2)
         |     / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl)) AS score
         | FROM (SELECT docid,
         |         sum(CASE WHEN ($total) <= $slop
         |             THEN 1.0 / (($total) + 1.0) ELSE 0.0 END) AS tfp
         |       FROM (SELECT a.docid, a.pos, $mins
         |             FROM tok a $joins
         |             WHERE a.term = ${sq(terms.head._1)}
         |             GROUP BY a.docid, a.pos) m
         |       GROUP BY docid
         |       HAVING sum(CASE WHEN ($total) <= $slop
         |              THEN 1.0 / (($total) + 1.0) ELSE 0.0 END) > 0) g
         | JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st)""".stripMargin

    case PrefixQ(p, rw) =>
      // prefixes come from the analyzer alphabet (no LIKE metachars)
      multiTermSql(s"term LIKE ${sq(p + "%")}", rw)

    case RegexQ(pat, rw) =>
      multiTermSql(s"regexp_full_match(term, ${sq(pat)})", rw)

    case FunctionQ(e) =>
      s"(SELECT docid, CAST($e AS DOUBLE) AS score FROM docs)"

    case CustomScoreQ(sub, e) =>
      val a = al()
      s"""(SELECT $a.docid, $a.score * CAST($e AS DOUBLE) AS score
         | FROM ${scoreSql(sub)} $a JOIN docs d ON d.docid = $a.docid)""".stripMargin

    case WildcardQ(pat, rw) =>
      multiTermSql(
        s"regexp_matches(term, ${sq(Searcher.globToRegex(pat))})", rw)

    case TermRangeQ(lo, hi, il, ih, rw, coll) =>
      // collated variant: DuckDB ships the same ICU locale collations
      val t = coll.map(c => s"(term COLLATE $c)").getOrElse("term")
      val conds = Seq(
        lo.map(v => s"$t ${if (il) ">=" else ">"} ${sq(v)}"),
        hi.map(v => s"$t ${if (ih) "<=" else "<"} ${sq(v)}")).flatten
      val w = if (conds.isEmpty) "TRUE" else conds.mkString(" AND ")
      multiTermSql(w, rw)

    case FuzzyQ(t, maxEdits) =>
      // the engine's pigeonhole candidate filter has guaranteed recall,
      // so the oracle can stay the semantically-equal full scan; terms
      // with boost <= 0 (dist >= min length) are EXCLUDED like the
      // engine (FuzzyTermEnum's positive similarity threshold)
      s"""(SELECT docid, sum(boosted) AS score FROM
         |  (SELECT p.docid, p.tscore * (1.0 - CAST(levenshtein(p.term, ${sq(t)}) AS DOUBLE)
         |          / CAST(least(length(p.term), ${t.length}) AS DOUBLE)) AS boosted
         |   FROM scored p WHERE levenshtein(p.term, ${sq(t)}) <= $maxEdits
         |     AND 1.0 - CAST(levenshtein(p.term, ${sq(t)}) AS DOUBLE)
         |          / CAST(least(length(p.term), ${t.length}) AS DOUBLE) > 0) ${al()}
         | GROUP BY docid)""".stripMargin

    case FuzzyLikeThisQ(text, maxEdits, maxNumTerms) =>
      // mirror of Searcher's FuzzyLikeThisQ plan, candidate generation
      // as the semantically-equal full dictionary scan (the engine's
      // trigram/pigeonhole filter has guaranteed recall): per source
      // term sim = 1 - dist/min-length, df_eff = the source term's df
      // or the INTEGER average of the variants' dfs, vscore =
      // sim² × idf(df_eff); top 50 variants per term then the globally
      // best maxNumTerms; doc contribution = vscore × tf-norm (variant
      // idf deliberately absent — FuzzyLikeThisQuery.cs:41-46)
      val srcTerms =
        graft.analysis.Analyzer.analyzeQuery(text).distinct
      if (srcTerms.isEmpty)
        // stopword-only / empty text: MatchNone, same as the engine
        return "(SELECT docid, 1.0 AS score FROM docs WHERE FALSE)"
      val srcVals = srcTerms.map(t => s"(${sq(t)})").mkString(", ")
      // ordered in-aggregate sum: the per-doc fold order matches the
      // engine's sort_array(ord) fold, so exact-tie docids stay ties in
      // BOTH engines and rank purely by the docid tie-break (a plain
      // parallel sum() makes near-tie ranks run-order-dependent)
      s"""(SELECT docid, sum(contrib ORDER BY ord) AS score FROM
         |  (SELECT p.docid, sel.src || '|' || sel.term AS ord,
         |          sel.vscore * ((p.tf * 2.2) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl))) AS contrib
         |   FROM (SELECT term, src, vscore FROM
         |          (SELECT term, src, vscore,
         |                  row_number() OVER (ORDER BY vscore DESC, term ASC, src ASC) AS grank
         |           FROM (SELECT term, src, n, df_eff,
         |                        sim * sim * ln(1.0 + (CAST(n AS DOUBLE) - df_eff + 0.5) / (df_eff + 0.5)) AS vscore,
         |                        row_number() OVER (PARTITION BY src ORDER BY sim DESC, term ASC) AS vrank
         |                 FROM (SELECT c.term, c.src, st2.n,
         |                              1.0 - CAST(c.dist AS DOUBLE) / CAST(least(length(c.term), length(c.src)) AS DOUBLE) AS sim,
         |                              coalesce(max(CASE WHEN c.term = c.src THEN c.df END) OVER (PARTITION BY c.src),
         |                                       CAST(floor(CAST(sum(c.df) OVER (PARTITION BY c.src) AS DOUBLE) / count(*) OVER (PARTITION BY c.src)) AS BIGINT)) AS df_eff
         |                       FROM (SELECT d.term, d.df, f.src, levenshtein(d.term, f.src) AS dist
         |                             FROM dict d CROSS JOIN (VALUES $srcVals) f(src)
         |                             WHERE levenshtein(d.term, f.src) <= $maxEdits
         |                               AND 1.0 - CAST(levenshtein(d.term, f.src) AS DOUBLE)
         |                                    / CAST(least(length(d.term), length(f.src)) AS DOUBLE) > 0) c
         |                       CROSS JOIN stats st2) x) y
         |           WHERE vrank <= ${Searcher.MaxVariantsPerTerm}) z
         |         WHERE grank <= $maxNumTerms) sel
         |   JOIN postings p ON p.term = sel.term
         |   JOIN doclens l ON l.docid = p.docid
         |   CROSS JOIN stats st) ${al()}
         | GROUP BY docid)""".stripMargin

    case MatchAllQ => "(SELECT docid, 1.0 AS score FROM docs)"

    case MatchNoneQ => "(SELECT docid, 1.0 AS score FROM docs WHERE FALSE)"

    case KeywordQ(field, value) =>
      s"(SELECT docid, 1.0 AS score FROM docs WHERE $field = ${sq(value)})"

    case RangeQ(field, lo, hi) =>
      val conds = Seq(lo.map(v => s"$field >= $v"), hi.map(v => s"$field < $v")).flatten
      s"(SELECT docid, 1.0 AS score FROM docs WHERE ${conds.mkString(" AND ")})"

    case DateRangeQ(field, lo, hi, res, il, ih) =>
      val pat = Map(
        "year" -> "%Y", "month" -> "%Y%m", "day" -> "%Y%m%d",
        "hour" -> "%Y%m%d%H", "minute" -> "%Y%m%d%H%M",
        "second" -> "%Y%m%d%H%M%S", "millisecond" -> "%Y%m%d%H%M%S%g")(res)
      val key = s"strftime($field, '$pat')"
      val conds = Seq(
        lo.map(v => s"$key ${if (il) ">=" else ">"} ${sq(v)}"),
        hi.map(v => s"$key ${if (ih) "<=" else "<"} ${sq(v)}")).flatten
      s"(SELECT docid, 1.0 AS score FROM docs WHERE ${conds.mkString(" AND ")})"

    case ConstantScoreQ(sub, s) =>
      s"(SELECT docid, CAST($s AS DOUBLE) AS score FROM ${scoreSql(sub)} ${al()})"

    case BoostQ(sub, b) =>
      s"(SELECT docid, score * $b AS score FROM ${scoreSql(sub)} ${al()})"

    case BoostingQ(pos, ctx, d) =>
      val pa = al(); val ca = al()
      s"""(SELECT $pa.docid,
         |   CASE WHEN $ca.docid IS NOT NULL THEN $pa.score * $d
         |        ELSE $pa.score END AS score
         | FROM ${scoreSql(pos)} $pa
         | LEFT JOIN (SELECT DISTINCT docid FROM ${scoreSql(ctx)} ${al()}) $ca
         |   ON $ca.docid = $pa.docid)""".stripMargin

    case DisMaxQ(ds, tie) =>
      val u = ds.map(c => s"SELECT docid, score FROM ${scoreSql(c)} ${al()}")
        .mkString(" UNION ALL ")
      s"""(SELECT docid, max(score) + $tie * (sum(score) - max(score)) AS score
         | FROM ($u) ${al()} GROUP BY docid)""".stripMargin

    case SpanFirstQ(t, end) =>
      s"""(SELECT docid, ${sumIdfSql(Seq(t))} * (tfp * 2.2)
         |   / (tfp + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)) AS score
         | FROM (SELECT docid, len, avgdl,
         |         CAST(len(list_filter(positions, p -> p < $end)) AS DOUBLE) AS tfp
         |       FROM scored WHERE term = ${sq(t)}) ${al()}
         | WHERE tfp > 0)""".stripMargin

    case SpanNearQ(a, b, slop, inOrder) =>
      val (cond, dist) =
        if (inOrder)
          (s"b.pos > a.pos AND b.pos - a.pos - 1 <= $slop", "b.pos - a.pos - 1")
        else
          (s"b.pos != a.pos AND abs(b.pos - a.pos) - 1 <= $slop",
            "abs(b.pos - a.pos) - 1")
      s"""(SELECT g.docid, ${sumIdfSql(Seq(a, b))} * (g.tfp * 2.2)
         |   / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl)) AS score
         | FROM (SELECT docid, sum(1.0 / (mind + 1.0)) AS tfp
         |       FROM (SELECT a.docid, a.pos, CAST(min($dist) AS DOUBLE) AS mind
         |             FROM tok a JOIN tok b ON b.docid = a.docid
         |                  AND b.term = ${sq(b)} AND $cond
         |             WHERE a.term = ${sq(a)}
         |             GROUP BY a.docid, a.pos) m
         |       GROUP BY docid) g
         | JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st)""".stripMargin

    case SpanNotQ(a, b, slop, exc) =>
      s"""(SELECT g.docid, ${sumIdfSql(Seq(a, b))} * (g.tfp * 2.2)
         |   / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl)) AS score
         | FROM (SELECT docid, sum(1.0 / (mind + 1.0)) AS tfp
         |       FROM (SELECT a.docid, a.pos, CAST(min(b.pos - a.pos - 1) AS DOUBLE) AS mind
         |             FROM tok a JOIN tok b ON b.docid = a.docid
         |                  AND b.term = ${sq(b)} AND b.pos > a.pos
         |                  AND b.pos - a.pos - 1 <= $slop
         |                  AND NOT EXISTS (SELECT 1 FROM tok e
         |                       WHERE e.docid = a.docid AND e.term = ${sq(exc)}
         |                         AND e.pos >= a.pos AND e.pos <= b.pos)
         |             WHERE a.term = ${sq(a)}
         |             GROUP BY a.docid, a.pos) m
         |       GROUP BY docid) g
         | JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st)""".stripMargin

    case SpanOrQ(ts) =>
      val in = ts.map(sq).mkString(", ")
      s"""(SELECT docid, ${sumIdfSql(ts.distinct)} * (tfp * 2.2)
         |   / (tfp + 1.2 * (1.0 - 0.75 + 0.75 * len / avgdl)) AS score
         | FROM (SELECT docid, CAST(sum(tf) AS DOUBLE) AS tfp,
         |         max(len) AS len, max(avgdl) AS avgdl
         |       FROM scored WHERE term IN ($in) GROUP BY docid) ${al()})""".stripMargin

    case SpanQ(sp) =>
      // row-based mirror of Searcher.spanQuery: each sub-span is a
      // (docid, s, e) derived table; greedy reduction = GROUP BY
      // (docid, s) MIN(e); freq = sum 1/(1 + e - s - minW)
      def spanSql(s: Span): String = s match {
        case STerm(t) =>
          s"(SELECT docid, pos AS s, pos AS e FROM tok WHERE term = ${sq(t)})"
        case SMask(f, v) =>
          // FieldMaskingSpanQuery analog: keyword field as one width-0
          // span at position 0 per matching doc
          s"(SELECT docid, 0 AS s, 0 AS e FROM docs WHERE $f = ${sq(v)})"
        case SNear(cs, slop, true) =>
          // TOTAL-gap semantics (NearSpansOrdered.cs:47): the running
          // column g accumulates Σ inter-clause gaps and the constraint
          // is on the sum — mirrors Searcher.spanQuery's chainG
          val init =
            s"(SELECT docid, s, e, 0 AS g FROM ${spanSql(cs.head)} ${al()})"
          val chained = cs.tail.foldLeft(init) { (a, c) =>
            val b = spanSql(c); val (x, y) = (al(), al())
            s"""(SELECT $x.docid, $x.s, $y.e, $x.g + $y.s - $x.e - 1 AS g
               | FROM $a $x JOIN $b $y ON $y.docid = $x.docid
               | AND $y.s > $x.e
               | AND $x.g + $y.s - $x.e - 1 <= $slop)""".stripMargin
          }
          s"(SELECT docid, s, e FROM $chained ${al()})"
        case SNear(Seq(a, b), slop, false) =>
          s"""(SELECT * FROM ${spanSql(SNear(Seq(a, b), slop, true))} ${al()}
             | UNION
             | SELECT * FROM ${spanSql(SNear(Seq(b, a), slop, true))} ${al()})""".stripMargin
        case SNear(cs, slop, false) =>
          // N>=3 unordered: envelope of one span per clause (any order,
          // overlap allowed), envelopeWidth - Σ clauseWidths <= slop —
          // mirrors Searcher.spanQuery's combination product
          val aliased = cs.map(c => (spanSql(c), al()))
          val (h, ha) = aliased.head
          val joins = aliased.tail
            .map { case (sql2, a2) =>
              s"JOIN $sql2 $a2 ON $a2.docid = $ha.docid" }
            .mkString(" ")
          val ss = aliased.map { case (_, a2) => s"$a2.s" }.mkString(", ")
          val es = aliased.map { case (_, a2) => s"$a2.e" }.mkString(", ")
          val cov = aliased
            .map { case (_, a2) => s"($a2.e - $a2.s + 1)" }.mkString(" + ")
          s"""(SELECT DISTINCT $ha.docid, least($ss) AS s, greatest($es) AS e
             | FROM $h $ha $joins
             | WHERE greatest($es) - least($ss) + 1 - ($cov) <= $slop)""".stripMargin
        case SOr(cs) =>
          // nestable SpanOrQuery: UNION (distinct) of clause span sets
          if (cs.isEmpty) "(SELECT docid, pos AS s, pos AS e FROM tok WHERE FALSE)"
          else cs.map(c => s"SELECT * FROM ${spanSql(c)} ${al()}")
            .mkString("(", " UNION ", ")")
        case SRegex(p) =>
          // SpanRegexQuery leaf: every occurrence of any dictionary term
          // matching the anchored pattern (the engine's SOr expansion,
          // expressed directly — regexp_full_match anchors like rlike ^$)
          s"(SELECT docid, pos AS s, pos AS e FROM tok WHERE regexp_full_match(term, ${sq(p)}))"
        case SFirst(sub, end) =>
          s"(SELECT * FROM ${spanSql(sub)} ${al()} WHERE e < $end)"
        case SNot(inc, exc) =>
          val (i, x) = (al(), al())
          s"""(SELECT $i.* FROM ${spanSql(inc)} $i
             | WHERE NOT EXISTS (SELECT 1 FROM ${spanSql(exc)} $x
             |   WHERE $x.docid = $i.docid AND $x.s <= $i.e AND $x.e >= $i.s))""".stripMargin
      }
      val minW = Spans.requiredLeaves(sp).size - 1
      val reqD = Spans.termsOf(Spans.requiredLeaves(sp).distinct)
      // SOr branch terms and SRegex expansions carry idf too (the
      // engine's scoringTs sum); SOr/SRegex-free trees keep the original
      // VALUES-join form verbatim
      val statics = Spans.scoringTerms(sp).distinct
      val regexes = Spans.scoringRegexes(sp).distinct
      val idfSql =
        if (regexes.isEmpty && statics == reqD) sumIdfSql(reqD)
        else {
          val conds =
            (if (statics.nonEmpty)
              Seq(s"d.term IN (${statics.map(sq).mkString(", ")})")
            else Nil) ++
              regexes.map(p => s"regexp_full_match(d.term, ${sq(p)})")
          s"""(SELECT coalesce(sum(ln(1.0 + (CAST(st.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))), 0.0)
             | FROM dict d CROSS JOIN stats st
             | WHERE ${conds.mkString(" OR ")})""".stripMargin
        }
      s"""(SELECT g.docid,
         |   $idfSql * (g.tfp * 2.2)
         |     / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl)) AS score
         | FROM (SELECT docid, sum(1.0 / (1.0 + greatest(0.0, CAST(e - s - $minW AS DOUBLE)))) AS tfp
         |       FROM (SELECT docid, s, min(e) AS e
         |             FROM (SELECT DISTINCT docid, s, e
         |                   FROM ${spanSql(sp)} ${al()}) ${al()}
         |             GROUP BY docid, s) ${al()}
         |       GROUP BY docid) g
         | JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st)""".stripMargin

    case MultiPhraseQ(slots) =>
      val allTerms = slots.flatMap(_._1)
      val off0 = slots.head._2
      def slotAgg(ts: Seq[String], i: Int): String =
        s"""(SELECT docid,
           |   list_sort(list_distinct(flatten(list(positions)))) AS pos$i,
           |   max(len) AS len, max(avgdl) AS avgdl
           | FROM scored WHERE term IN (${ts.map(sq).mkString(", ")})
           | GROUP BY docid) s$i""".stripMargin
      val joins = slots.zipWithIndex.tail
        .map { case ((ts, _), i) =>
          s"JOIN ${slotAgg(ts, i)} ON s$i.docid = s0.docid" }
        .mkString(" ")
      val conds = slots.zipWithIndex.tail.map { case ((_, offk), k) =>
        s"list_contains(s$k.pos$k, p + ${offk - off0})"
      }
      val lam = if (conds.isEmpty) "p -> true" else s"p -> ${conds.mkString(" AND ")}"
      s"""(SELECT j.docid, ${sumIdfSql(allTerms)} * (j.tfp * 2.2)
         |   / (j.tfp + 1.2 * (1.0 - 0.75 + 0.75 * j.len / j.avgdl)) AS score
         | FROM (SELECT s0.docid, s0.len, s0.avgdl,
         |         CAST(len(list_filter(s0.pos0, $lam)) AS DOUBLE) AS tfp
         |       FROM ${slotAgg(slots.head._1, 0)} $joins) j
         | WHERE j.tfp > 0)""".stripMargin

    case MoreLikeThisQ(src, topN) =>
      // same ranking as Searcher.moreLikeThis: source doc's terms by
      // tf·idf desc, term asc; tf from the source doc's own posting rows
      s"""(SELECT sc.docid, sum(sc.tscore) AS score
         | FROM scored sc JOIN (
         |   SELECT term FROM (
         |     SELECT p.term, row_number() OVER (ORDER BY
         |         p.tf * ln(1.0 + (CAST(st.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)) DESC,
         |         p.term) AS rn
         |     FROM postings p JOIN dict d USING (term) CROSS JOIN stats st
         |     WHERE p.docid = $src) z
         |   WHERE rn <= $topN) mlt ON mlt.term = sc.term
         | WHERE sc.docid != $src
         | GROUP BY sc.docid)""".stripMargin
  }

  /** Full oracle statement for a top-k query: rank + docid + rounded score,
    * (score desc, docid asc) tie-break per TopScoreDocCollector.cs:56-64. */
  def topK(q: Query, k: Int): String =
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |       sq.docid, round(sq.score, 4) AS score
       |FROM ${scoreSql(q)} sq
       |ORDER BY sq.score DESC, sq.docid
       |LIMIT $k""".stripMargin

  /** Batched multi-query top-k oracle: each registry query's proven
    * single-query topK body, qid-tagged and UNION ALLed over one
    * shared prelude — the per-query rows must equal running topK(q)
    * alone, which is exactly what the engine's one-scan batch
    * guarantees. */
  def topKBatch(queries: Seq[(String, Query)], k: Int): String = {
    val branches = queries.map { case (qid, q) =>
      s"(SELECT ${sq(qid)} AS qid, " +
        "CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) " +
        "AS BIGINT) AS rank, sq.docid, round(sq.score, 4) AS score " +
        s"FROM ${scoreSql(q)} sq ORDER BY sq.score DESC, sq.docid " +
        s"LIMIT $k)"
    }.mkString("\nUNION ALL\n")
    s"$prelude\nSELECT * FROM (\n$branches\n) ORDER BY qid, rank"
  }

  /** Filtered top-k oracle (FilteredQuery + CachingWrapperFilter
    * analog): the filter GATES docids but contributes no score. */
  def topKFiltered(q: Query, filterWhere: String, k: Int): String =
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |       sq.docid, round(sq.score, 4) AS score
       |FROM ${scoreSql(q)} sq
       |WHERE sq.docid IN (SELECT docid FROM docs WHERE $filterWhere)
       |ORDER BY sq.score DESC, sq.docid
       |LIMIT $k""".stripMargin

  /** Docid-set subquery for a [[graft.search.DocFilter]] (contrib
    * Queries filter family) — parenthesized, usable as a derived table.
    * Mirrors Searcher.filterBits exactly, including BooleanFilter.cs's
    * evaluation order (shoulds → base; only-NOTs → all-docs base;
    * NOTs subtract; remaining MUSTs intersect). */
  def filterSetSql(f: DocFilter): String = f match {
    case TermsF(ts) =>
      val pred = ts.map { case (fld, v) => s"$fld = ${sq(v)}" }
        .mkString(" OR ")
      s"(SELECT docid FROM docs WHERE $pred)"
    case QueryF(q) =>
      s"(SELECT docid FROM ${scoreSql(q)} ${al()})"
    case DuplicateF(field, keepFirst) =>
      val agg = if (keepFirst) "min" else "max"
      s"""(SELECT $agg(docid) AS docid FROM docs
         | WHERE $field IS NOT NULL GROUP BY $field)""".stripMargin
    case BoolF(m, sh, n) =>
      val base =
        if (sh.nonEmpty)
          sh.map(f => s"SELECT docid FROM ${filterSetSql(f)} ${al()}")
            .mkString("(", " UNION ", ")")
        else if (m.nonEmpty) filterSetSql(m.head)
        else "(SELECT docid FROM docs)"
      val remainingMusts = if (sh.nonEmpty) m else m.drop(1)
      val afterNot = n.foldLeft(base)((acc, f) =>
        s"""(SELECT docid FROM $acc ${al()}
           | EXCEPT SELECT docid FROM ${filterSetSql(f)} ${al()})"""
          .stripMargin)
      remainingMusts.foldLeft(afterNot)((acc, f) =>
        s"""(SELECT docid FROM $acc ${al()}
           | INTERSECT SELECT docid FROM ${filterSetSql(f)} ${al()})"""
          .stripMargin)
    case ChainF(first, links) =>
      links.foldLeft(filterSetSql(first)) { case (acc, (op, f)) =>
        val b = filterSetSql(f)
        val a = s"SELECT docid FROM $acc ${al()}"
        val bb = s"SELECT docid FROM $b ${al()}"
        op match {
          case ChainAnd => s"($a INTERSECT $bb)"
          case ChainOr => s"($a UNION $bb)"
          case ChainAndNot => s"($a EXCEPT $bb)"
          case ChainXor =>
            s"""((SELECT docid FROM $acc ${al()}
               |  UNION SELECT docid FROM $b ${al()})
               | EXCEPT
               | (SELECT docid FROM $acc ${al()}
               |  INTERSECT SELECT docid FROM $b ${al()}))""".stripMargin
        }
      }
  }

  /** Filtered top-k where the gate is a [[DocFilter]] docid set (the
    * filter-algebra analog of [[topKFiltered]]). */
  def topKFilterSet(q: Query, f: DocFilter, k: Int): String =
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |       sq.docid, round(sq.score, 4) AS score
       |FROM ${scoreSql(q)} sq
       |WHERE sq.docid IN (SELECT docid FROM ${filterSetSql(f)} fset)
       |ORDER BY sq.score DESC, sq.docid
       |LIMIT $k""".stripMargin

  /** Payload-term top-k oracle (PayloadTermQuery + positionBoost
    * assigner): the payload of an occurrence at position p is `boost`
    * when p < firstN else the neutral 1.0 — recomputed here from the
    * positions list, independent of the engine's stored payload bytes. */
  def payloadTermTopK(term: String, fn: graft.search.PayloadFn,
      firstN: Int, boost: Double, includeSpanScore: Boolean,
      k: Int): String = {
    val payList =
      s"list_transform(sq.positions, p -> CASE WHEN p < $firstN " +
        s"THEN CAST($boost AS DOUBLE) ELSE 1.0 END)"
    val payAgg = fn match {
      case graft.search.PayAvg => s"list_aggregate($payList, 'avg')"
      case graft.search.PayMin => s"list_aggregate($payList, 'min')"
      case graft.search.PayMax => s"list_aggregate($payList, 'max')"
    }
    val base = if (includeSpanScore) s"sq.tscore * " else ""
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY s2.score DESC, s2.docid) AS BIGINT) AS rank,
       |       s2.docid, round(s2.score, 4) AS score
       |FROM (SELECT sq.docid, $base$payAgg AS score
       |      FROM scored sq WHERE sq.term = ${sq(term)}) s2
       |ORDER BY s2.score DESC, s2.docid
       |LIMIT $k""".stripMargin
  }

  /** Payload-near top-k oracle (PayloadNearQuery + positionBoost):
    * ordered 2-term near with min-gap span semantics; payloads of both
    * span ends ((a.pos, qmin)) recomputed from positions. Payload
    * values are exactly-representable doubles (boost or 1.0), so the
    * avg's summation order is irrelevant. */
  def payloadNearTopK(a: String, b: String, slop: Int,
      fn: graft.search.PayloadFn, firstN: Int, boost: Double,
      includeSpanScore: Boolean, k: Int): String = {
    def pay(e: String): String =
      s"CASE WHEN $e < $firstN THEN CAST($boost AS DOUBLE) ELSE 1.0 END"
    val payAgg = fn match {
      case graft.search.PayAvg =>
        s"(sum(${pay("m.pos")}) + sum(${pay("m.qmin")})) / (2.0 * count(*))"
      case graft.search.PayMin =>
        s"least(min(${pay("m.pos")}), min(${pay("m.qmin")}))"
      case graft.search.PayMax =>
        s"greatest(max(${pay("m.pos")}), max(${pay("m.qmin")}))"
    }
    val spanScore =
      s"""${sumIdfSql(Seq(a, b))} * (g.tfp * 2.2)
         |     / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl))""".stripMargin
    val score =
      if (includeSpanScore) s"$spanScore * g.pay" else "g.pay"
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY s2.score DESC, s2.docid) AS BIGINT) AS rank,
       |       s2.docid, round(s2.score, 4) AS score
       |FROM (
       |  SELECT g.docid, $score AS score
       |  FROM (SELECT m.docid, sum(1.0 / (m.mind + 1.0)) AS tfp,
       |               $payAgg AS pay
       |        FROM (SELECT a.docid, a.pos,
       |                     CAST(min(b.pos - a.pos - 1) AS DOUBLE) AS mind,
       |                     min(b.pos) AS qmin
       |              FROM tok a JOIN tok b ON b.docid = a.docid
       |                   AND b.term = ${sq(b)} AND b.pos > a.pos
       |                   AND b.pos - a.pos - 1 <= $slop
       |              WHERE a.term = ${sq(a)}
       |              GROUP BY a.docid, a.pos) m
       |        GROUP BY m.docid) g
       |  JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st) s2
       |ORDER BY s2.score DESC, s2.docid
       |LIMIT $k""".stripMargin
  }

  /** N-term ordered payload span-near oracle (PayloadSpanNearQ): the
    * min-chain is built by one grouped join per clause (per prefix
    * chain, the MIN qualifying next occurrence) under the TOTAL-gap
    * constraint (p_i − p_0 − i ≤ slop — NearSpansOrdered matchLength),
    * sloppy freq 1/(1 + width − (N−1)), payloads summed over every
    * chain member. */
  def payloadSpanNearTopK(terms: Seq[String], slop: Int,
      fn: graft.search.PayloadFn, firstN: Int, boost: Double,
      includeSpanScore: Boolean, k: Int): String = {
    val n = terms.size
    def pay(e: String): String =
      s"CASE WHEN $e < $firstN THEN CAST($boost AS DOUBLE) ELSE 1.0 END"
    // m0: first-clause occurrences; m_k adds p_k = min qualifying next
    val base =
      s"""(SELECT a.docid, a.pos AS p0 FROM tok a
         |              WHERE a.term = ${sq(terms.head)})""".stripMargin
    val chain = (1 until n).foldLeft(base) { (prev, i) =>
      val keep = (0 until i).map(j => s"m.p$j").mkString(", ")
      s"""(SELECT m.docid, $keep, min(x.pos) AS p$i
         |              FROM $prev m JOIN tok x ON x.docid = m.docid
         |                   AND x.term = ${sq(terms(i))} AND x.pos > m.p${i - 1}
         |                   AND x.pos - m.p0 - $i <= $slop
         |              GROUP BY m.docid, $keep)""".stripMargin
    }
    val payAgg = {
      val sums = (0 until n).map(j => s"sum(${pay(s"m.p$j")})").mkString(" + ")
      val mins = (0 until n).map(j => s"min(${pay(s"m.p$j")})").mkString(", ")
      val maxs = (0 until n).map(j => s"max(${pay(s"m.p$j")})").mkString(", ")
      fn match {
        case graft.search.PayAvg => s"($sums) / ($n.0 * count(*))"
        case graft.search.PayMin => s"least($mins)"
        case graft.search.PayMax => s"greatest($maxs)"
      }
    }
    val spanScore =
      s"""${sumIdfSql(terms)} * (g.tfp * 2.2)
         |     / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl))""".stripMargin
    val score =
      if (includeSpanScore) s"$spanScore * g.pay" else "g.pay"
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY s2.score DESC, s2.docid) AS BIGINT) AS rank,
       |       s2.docid, round(s2.score, 4) AS score
       |FROM (
       |  SELECT g.docid, $score AS score
       |  FROM (SELECT m.docid,
       |               sum(1.0 / (1.0 + m.p${n - 1} - m.p0 - ${n - 1}.0)) AS tfp,
       |               $payAgg AS pay
       |        FROM $chain m
       |        GROUP BY m.docid) g
       |  JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st) s2
       |ORDER BY s2.score DESC, s2.docid
       |LIMIT $k""".stripMargin
  }

  /** Unordered N-term payload span-near oracle: every combination of
    * one occurrence per clause whose envelope width − (N−1) ≤ slop — a
    * plain N-way position join; sloppy freq over the envelope width,
    * payloads from every member. */
  def payloadSpanNearUnordTopK(terms: Seq[String], slop: Int,
      fn: graft.search.PayloadFn, firstN: Int, boost: Double,
      includeSpanScore: Boolean, k: Int): String = {
    val n = terms.size
    def pay(e: String): String =
      s"CASE WHEN $e < $firstN THEN CAST($boost AS DOUBLE) ELSE 1.0 END"
    val joins = terms.zipWithIndex.map { case (t, i) =>
      if (i == 0) s"tok t0"
      else s"JOIN tok t$i ON t$i.docid = t0.docid AND t$i.term = ${sq(t)}"
    }.mkString("\n              ")
    val ps = (0 until n).map(i => s"t$i.pos").mkString(", ")
    val width = s"greatest($ps) - least($ps)"
    val payAgg = {
      val sums = (0 until n).map(j => s"sum(${pay(s"m.p$j")})").mkString(" + ")
      val mins = (0 until n).map(j => s"min(${pay(s"m.p$j")})").mkString(", ")
      val maxs = (0 until n).map(j => s"max(${pay(s"m.p$j")})").mkString(", ")
      fn match {
        case graft.search.PayAvg => s"($sums) / ($n.0 * count(*))"
        case graft.search.PayMin => s"least($mins)"
        case graft.search.PayMax => s"greatest($maxs)"
      }
    }
    val spanScore =
      s"""${sumIdfSql(terms)} * (g.tfp * 2.2)
         |     / (g.tfp + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl))""".stripMargin
    val score =
      if (includeSpanScore) s"$spanScore * g.pay" else "g.pay"
    val sel = (0 until n).map(i => s"t$i.pos AS p$i").mkString(", ")
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY s2.score DESC, s2.docid) AS BIGINT) AS rank,
       |       s2.docid, round(s2.score, 4) AS score
       |FROM (
       |  SELECT g.docid, $score AS score
       |  FROM (SELECT m.docid,
       |               sum(1.0 / (1.0 + greatest(0.0, m.w - ${n - 1}.0))) AS tfp,
       |               $payAgg AS pay
       |        FROM (SELECT t0.docid, $sel, $width AS w
       |              FROM $joins
       |              WHERE t0.term = ${sq(terms.head)}
       |                AND $width + 1 - $n <= $slop) m
       |        GROUP BY m.docid) g
       |  JOIN doclens l ON l.docid = g.docid CROSS JOIN stats st) s2
       |ORDER BY s2.score DESC, s2.docid
       |LIMIT $k""".stripMargin
  }

  /** TermQ top-k over a Shingles(2, keepUnigrams) index: the analysis
    * chain is extended with order-indexed kept tokens and their
    * bigrams, and postings/lens/stats are recomputed over the combined
    * stream (the engine's len = analyzed token count, so a shingled doc
    * counts unigrams + bigrams). */
  def shingleTermTopK(term: String, k: Int): String =
    s"""$prelude,
       |kept AS (
       |  SELECT docid, pos, term,
       |         row_number() OVER (PARTITION BY docid ORDER BY pos) AS rn
       |  FROM tok),
       |shing AS (
       |  SELECT a.docid, a.pos, a.term || '_' || b.term AS term
       |  FROM kept a JOIN kept b ON b.docid = a.docid AND b.rn = a.rn + 1),
       |tok2 AS (
       |  SELECT docid, pos, term FROM tok
       |  UNION ALL SELECT docid, pos, term FROM shing),
       |postings2 AS (
       |  SELECT term, docid, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok2 GROUP BY term, docid),
       |doclens2 AS (
       |  SELECT d.docid, CAST(coalesce(t.len, 0) AS BIGINT) AS len
       |  FROM docs d LEFT JOIN (SELECT docid, count(*) AS len
       |                         FROM tok2 GROUP BY docid) t USING (docid)),
       |stats2 AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(len) AS DOUBLE) / count(*) AS avgdl
       |  FROM doclens2),
       |dict2 AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM postings2 GROUP BY term)
       |SELECT CAST(row_number() OVER (ORDER BY s2.score DESC, s2.docid) AS BIGINT) AS rank,
       |       s2.docid, round(s2.score, 4) AS score
       |FROM (
       |  SELECT p.docid,
       |         ln(1.0 + (CAST(st.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
       |           * (p.tf * 2.2) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.len / st.avgdl)) AS score
       |  FROM postings2 p JOIN dict2 d USING (term)
       |       JOIN doclens2 l USING (docid) CROSS JOIN stats2 st
       |  WHERE p.term = ${sq(term)}) s2
       |ORDER BY s2.score DESC, s2.docid
       |LIMIT $k""".stripMargin

  /** Matched-docid oracle (percolation membership: the doc set a query
    * matches, scores ignored). */
  def matchedDocids(q: Query): String =
    s"""$prelude
       |SELECT sq.docid FROM ${scoreSql(q)} sq ORDER BY sq.docid""".stripMargin

  /** Multi-query percolation oracle: one membership sweep per registered
    * query through the full SQL scoring pipeline, unioned with the
    * query id — the turn-addressed twin of [[matchedDocids]] (the
    * percolator emits (conv_id, turn_idx), not docids). */
  def percolateMulti(registry: Seq[(String, Query)]): String = {
    val parts = registry.map { case (qid, q) =>
      s"""SELECT d.conv_id, d.turn_idx, ${sq(qid)} AS query_id
         |FROM ${scoreSql(q)} sq JOIN docs d ON d.docid = sq.docid""".stripMargin
    }
    s"""$prelude
       |${parts.mkString("\nUNION ALL\n")}
       |ORDER BY conv_id, turn_idx, query_id""".stripMargin
  }

  /** Scored multi-query percolation oracle: membership per query via
    * the corpus pipeline (same sets as [[percolateMulti]]), score via
    * SINGLE-DOC BM25 — the doc is its own corpus, so numDocs = 1,
    * df = 1 (idf = ln(1 + 0.5/1.5) per present term) and the length
    * norm cancels (len/avgdl = 1 exactly). Supports the registry's
    * percolation shapes: TermQ, flat BoolQ over TermQ + MUST-side
    * KeywordQ (each matched keyword contributes the constant 1.0), and
    * 2-term exact PhraseQ. */
  def percolateScored(registry: Seq[(String, Query)]): String = {
    val idf1 = "ln(1.0 + (1.0 - 1 + 0.5) / (1 + 0.5))"
    val norm1 = "1.2 * (1.0 - 0.75 + 0.75 * 1.0)"
    // fold contributions in CLAUSE order (the MemoryIndex.score fold),
    // not term order: each clause is either a term (joined by its
    // clause ordinal — a repeated term joins once PER CLAUSE, like the
    // evaluator scores it) or a matched-keyword constant emitted at
    // its ordinal; zero-contribution unmatched shoulds drop out of the
    // sum exactly like adding 0.0 does
    def fold(clauses: Seq[Either[String, Double]]): String = {
      val termVals = clauses.zipWithIndex.collect {
        case (Left(t), i) => s"(${sq(t)}, $i)" }
      val termPart =
        if (termVals.isEmpty) Nil
        else Seq("SELECT m.docid, m.c, o.ord FROM mcontrib m JOIN " +
          s"(VALUES ${termVals.mkString(", ")}) o(term, ord) " +
          "ON o.term = m.term")
      val constParts = clauses.zipWithIndex.collect {
        case (Right(v), i) =>
          s"SELECT docid, $v AS c, $i AS ord FROM doclens" }
      s"""(SELECT docid, sum(c ORDER BY ord) AS score
         | FROM (${(termPart ++ constParts).mkString("\n  UNION ALL ")}) z
         | GROUP BY docid)""".stripMargin
    }
    def phrase2(a: String, b: String, delta: Int): String =
      s"""(SELECT z.docid,
         |   (2 * $idf1) * (z.tfp * 2.2) / (z.tfp + $norm1) AS score
         | FROM (SELECT pa.docid,
         |         CAST(len(list_filter(pa.positions,
         |           x -> list_contains(pb.positions, x + $delta)))
         |           AS DOUBLE) AS tfp
         |       FROM postings pa JOIN postings pb ON pa.docid = pb.docid
         |       WHERE pa.term = ${sq(a)} AND pb.term = ${sq(b)}) z
         | WHERE z.tfp > 0)""".stripMargin
    def scoreExpr(q: Query): String = q match {
      case TermQ(t) => fold(Seq(Left(t)))
      case BoolQ(m, s, _, _) =>
        // SHOULD keywords are rejected: a per-doc maybe-matched
        // constant cannot be folded without per-doc field data here
        require(s.forall(_.isInstanceOf[TermQ]) &&
          m.forall(c => c.isInstanceOf[TermQ] || c.isInstanceOf[KeywordQ]),
          s"percolateScored: unsupported clause shape in $q")
        fold((m ++ s).map {
          case TermQ(t) => Left(t)
          case _: KeywordQ => Right(1.0) // MUST keyword: matched = 1.0
          case other => sys.error(s"unreachable: $other")
        })
      case PhraseQ(Seq((a, oa), (b, ob)), 0) => phrase2(a, b, ob - oa)
      case other =>
        sys.error(s"percolateScored: unsupported query shape $other")
    }
    val parts = registry.map { case (qid, q) =>
      s"""SELECT d.conv_id, d.turn_idx, ${sq(qid)} AS query_id,
         |       round(sc.score, 4) AS score
         |FROM ${scoreSql(q)} sq
         |     JOIN docs d ON d.docid = sq.docid
         |     JOIN ${scoreExpr(q)} sc ON sc.docid = sq.docid""".stripMargin
    }
    s"""$prelude,
       |mcontrib AS (
       |  SELECT docid, term,
       |         $idf1 * (tf * 2.2) / (tf + $norm1) AS c
       |  FROM postings)
       |${parts.mkString("\nUNION ALL\n")}
       |ORDER BY conv_id, turn_idx, query_id""".stripMargin
  }

  /** Count-only oracle (TotalHitCountCollector analog). */
  def countQ(q: Query): String =
    s"""$prelude
       |SELECT CAST(count(*) AS BIGINT) AS hits FROM ${scoreSql(q)} sq""".stripMargin

  /** Field-sorted top-k oracle (TopFieldCollector analog): same output
    * shape as Engine.topKSorted. */
  def topKSorted(q: Query, sorts: Seq[SortField], k: Int): String = {
    val fieldCols = sorts.map(_.field).filter(_ != "score").distinct
    val order = (sorts.map { s =>
      val c = if (s.field == "score") "sq.score" else s"d.${s.field}"
      s"$c ${if (s.desc) "DESC" else "ASC"}"
    } :+ "sq.docid ASC").mkString(", ")
    val fields = fieldCols.map {
      case "ts" => "CAST(epoch(d.ts) AS BIGINT) AS ts, "
      case f => s"d.$f, "
    }.mkString
    s"""$prelude
       |SELECT CAST(row_number() OVER (ORDER BY $order) AS BIGINT) AS rank,
       |       sq.docid, ${fields}round(sq.score, 4) AS score
       |FROM ${scoreSql(q)} sq JOIN docs d ON d.docid = sq.docid
       |ORDER BY $order
       |LIMIT $k""".stripMargin
  }

  /** Highlighter oracle (contrib Highlighter.cs:34 analog): for each
    * top-k hit, the best `window`-raw-token window by query-term
    * occurrence count (leftmost tie-break), matched tokens wrapped in
    * [brackets] — the exact arithmetic of Highlight.bestFragment
    * expressed over the rawtok CTE (DuckDB 1-based list slicing). */
  def highlight(q: Query, k: Int, window: Int): String = {
    val inList = QueryAst.terms(q).toSeq.sorted.map(sq).mkString(", ")
    s"""$prelude,
       |hits AS (
       |  SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |         sq.docid
       |  FROM ${scoreSql(q)} sq
       |  ORDER BY sq.score DESC, sq.docid
       |  LIMIT $k),
       |htoks AS (
       |  SELECT h.rank, h.docid, r.toks,
       |         least($window, len(r.toks)) AS w, len(r.toks) AS n
       |  FROM hits h JOIN rawtok r USING (docid)),
       |starts AS (
       |  -- lateral generate_series is unsupported for table functions;
       |  -- unnest(range(...)) in the select list expands rows instead
       |  SELECT rank, docid, toks, w,
       |         unnest(range(1, n - w + 2)) AS i
       |  FROM htoks),
       |best AS (
       |  SELECT rank, docid, toks, w, i FROM (
       |    SELECT rank, docid, toks, w, i,
       |           row_number() OVER (PARTITION BY docid ORDER BY
       |             len(list_filter(toks[i:i+w-1], t -> t IN ($inList))) DESC,
       |             i ASC) AS rn
       |    FROM starts) z
       |  WHERE rn = 1)
       |SELECT rank, docid,
       |  array_to_string(list_transform(toks[i:i+w-1],
       |    t -> CASE WHEN t IN ($inList) THEN '[' || t || ']' ELSE t END),
       |    ' ') AS snippet
       |FROM best ORDER BY rank""".stripMargin
  }

  /** N-fragment scored highlighter oracle (Highlighter.cs:137
    * GetBestFragments / FastVectorHighlighter FieldFragList analog):
    * consecutive non-overlapping `window`-token fragments
    * (SimpleFragmenter), fragment score = query-term occurrence count,
    * top `maxFrags` per hit by (score desc, position asc), zero-score
    * fragments dropped — the exact arithmetic of
    * Highlight.topFragments. */
  def highlightN(q: Query, k: Int, window: Int, maxFrags: Int): String = {
    val inList = QueryAst.terms(q).toSeq.sorted.map(sq).mkString(", ")
    s"""$prelude,
       |hits AS (
       |  SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |         sq.docid
       |  FROM ${scoreSql(q)} sq
       |  ORDER BY sq.score DESC, sq.docid
       |  LIMIT $k),
       |htoks AS (
       |  SELECT h.rank, h.docid, r.toks, len(r.toks) AS n
       |  FROM hits h JOIN rawtok r USING (docid)),
       |fstarts AS (
       |  SELECT rank, docid, toks, n,
       |         unnest(range(1, n + 1, $window)) AS i
       |  FROM htoks),
       |fscored AS (
       |  SELECT rank, docid, toks, n, i,
       |         len(list_filter(toks[i:least(i + $window - 1, n)],
       |           t -> t IN ($inList))) AS fscore
       |  FROM fstarts),
       |sel AS (
       |  SELECT rank, docid, toks, n, i, fscore,
       |         row_number() OVER (PARTITION BY docid ORDER BY
       |           fscore DESC, i ASC) AS frag
       |  FROM fscored WHERE fscore > 0)
       |SELECT rank, docid, CAST(frag AS BIGINT) AS frag,
       |  CAST(fscore AS BIGINT) AS fscore,
       |  array_to_string(list_transform(toks[i:least(i + $window - 1, n)],
       |    t -> CASE WHEN t IN ($inList) THEN '[' || t || ']' ELSE t END),
       |    ' ') AS snippet
       |FROM sel WHERE frag <= $maxFrags ORDER BY rank, frag""".stripMargin
  }

  /** IDF-WEIGHTED N-fragment highlighter oracle (QueryScorer semantics:
    * fragment score = Σ weight over DISTINCT matched terms,
    * QueryScorer.cs:167-173; weight = boost × (ln(N/(df+1)) + 1),
    * QueryTermExtractor.cs:70) — the exact arithmetic of
    * Highlight.topFragmentsWeighted, fragment chunking and ranking
    * identical to [[highlightN]]. */
  def highlightWeighted(q: Query, k: Int, window: Int,
      maxFrags: Int): String = {
    val bs = QueryAst.termBoosts(q).toSeq.sortBy(_._1)
    val inList = bs.map(t => sq(t._1)).mkString(", ")
    val vals = bs.map { case (t, b) => s"(${sq(t)}, CAST($b AS DOUBLE))" }
      .mkString(", ")
    s"""$prelude,
       |qw AS (
       |  SELECT v.term,
       |         v.b * (ln(CAST(s.n AS DOUBLE) / (coalesce(d.df, 0) + 1)) + 1.0) AS wt
       |  FROM (VALUES $vals) v(term, b)
       |  LEFT JOIN dict d USING (term) CROSS JOIN stats s),
       |hits AS (
       |  SELECT CAST(row_number() OVER (ORDER BY sq.score DESC, sq.docid) AS BIGINT) AS rank,
       |         sq.docid
       |  FROM ${scoreSql(q)} sq
       |  ORDER BY sq.score DESC, sq.docid
       |  LIMIT $k),
       |htoks AS (
       |  SELECT h.rank, h.docid, r.toks, len(r.toks) AS n
       |  FROM hits h JOIN rawtok r USING (docid)),
       |fstarts AS (
       |  SELECT rank, docid, toks, n,
       |         unnest(range(1, n + 1, $window)) AS i
       |  FROM htoks),
       |fterms AS (
       |  SELECT rank, docid, i,
       |         unnest(list_distinct(list_filter(toks[i:least(i + $window - 1, n)],
       |           t -> t IN ($inList)))) AS term
       |  FROM fstarts),
       |fsc AS (
       |  SELECT f.rank, f.docid, f.i, sum(w.wt) AS fscore
       |  FROM fterms f JOIN qw w USING (term)
       |  GROUP BY f.rank, f.docid, f.i),
       |sel AS (
       |  SELECT s2.rank, s2.docid, s2.toks, s2.n, s2.i, f.fscore,
       |         row_number() OVER (PARTITION BY s2.docid ORDER BY
       |           f.fscore DESC, s2.i ASC) AS frag
       |  FROM fsc f JOIN fstarts s2 USING (rank, docid, i)
       |  WHERE f.fscore > 0)
       |SELECT rank, docid, CAST(frag AS BIGINT) AS frag,
       |  round(fscore, 4) AS fscore,
       |  array_to_string(list_transform(toks[i:least(i + $window - 1, n)],
       |    t -> CASE WHEN t IN ($inList) THEN '[' || t || ']' ELSE t END),
       |    ' ') AS snippet
       |FROM sel WHERE frag <= $maxFrags ORDER BY rank, frag""".stripMargin
  }

  /** Score-breakdown oracle (Explain analog) — operand order identical
    * to Bm25.idfCol/tfNorm. */
  def explainTerm(t: String): String =
    s"""$prelude
       |SELECT p.docid, p.term, p.tf, l.len, d.df,
       |  round(ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5)), 4) AS idf,
       |  round((p.tf * 2.2) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.len / s.avgdl)), 4) AS tfnorm,
       |  round(ln(1.0 + (CAST(s.n AS DOUBLE) - d.df + 0.5) / (d.df + 0.5))
       |    * (p.tf * 2.2) / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.len / s.avgdl)), 4) AS score
       |FROM postings p JOIN dict d USING (term)
       |     JOIN doclens l USING (docid) CROSS JOIN stats s
       |WHERE p.term = ${sq(t)}
       |ORDER BY p.docid""".stripMargin
}
