package graft.search

import graft.analysis.Analyzers

/** MemoryIndex analog (contrib Memory, MemoryIndex.cs:97): index ONE
  * document in RAM and evaluate queries against it — the percolation /
  * alerting primitive (match registered queries against each incoming
  * document instead of documents against a stored index).
  *
  * Pure Scala, no Spark plan: the doc's inverted view is a
  * term → sorted-positions map plus optional keyword fields. `matches`
  * implements exactly the engine's MEMBERSHIP semantics for the
  * supported operators — MemoryIndexSpec asserts agreement with the
  * distributed Searcher query-by-query, and the ft_percolate gate
  * replays a percolation sweep against the SQL oracle. Scoring-only
  * constructs (payloads, function queries, WAND) are out of scope for
  * match/no-match percolation and throw.
  */
final case class MemoryIndex(terms: Map[String, Vector[Int]],
    fields: Map[String, String] = Map.empty) {

  private def editDistance(a: String, b: String): Int =
    StringDistances.editDistance(a, b)

  def matches(q: Query): Boolean = q match {
    case TermQ(t) => terms.contains(t)
    case MatchAllQ => true
    case MatchNoneQ => false
    case BoolQ(m, s, n, msm) =>
      // same clause algebra as the distributed evaluator: a boolean
      // needs >= 1 positive clause (Searcher's "empty BooleanQuery"
      // require), and minShouldMatch binds SHOULD clauses ONLY — with
      // none present it is vacuous (the Searcher's scnt filter exists
      // only on the should subplan; must-only queries never see msm)
      require(m.nonEmpty || s.nonEmpty, "empty BooleanQuery")
      val floor =
        if (s.isEmpty) 0 else if (m.isEmpty) math.max(1, msm) else msm
      m.forall(matches) && s.count(matches) >= floor && !n.exists(matches)
    case PhraseQ(ts, 0) =>
      val off0 = ts.head._2
      terms.getOrElse(ts.head._1, Vector.empty).exists(p =>
        ts.tail.forall { case (t, off) =>
          terms.getOrElse(t, Vector.empty).contains(p + off - off0)
        })
    case PhraseQ(ts, slop) =>
      // sloppy membership, the Searcher.phrase twin: per driving
      // position of slot 0, every other slot needs a position within
      // slop of its expected offset, and the summed minimal
      // displacements must stay within slop
      val off0 = ts.head._2
      terms.getOrElse(ts.head._1, Vector.empty).exists { p =>
        val dists = ts.tail.map { case (t, off) =>
          val gap = off - off0
          terms.getOrElse(t, Vector.empty).iterator
            .map(j => math.abs(j - p - gap)).filter(_ <= slop)
            .minOption
        }
        dists.forall(_.isDefined) && dists.flatten.sum <= slop
      }
    case ConstantScoreQ(s, _) => matches(s)
    case BoostQ(s, _) => matches(s)
    case BoostingQ(p, _, _) => matches(p) // context only modulates score
    case DisMaxQ(ds, _) => ds.exists(matches)
    case PrefixQ(p, _) => terms.keysIterator.exists(_.startsWith(p))
    case WildcardQ(pat, _) =>
      val re = Searcher.globToRegex(pat).r
      terms.keysIterator.exists(t => re.findFirstIn(t).isDefined)
    case RegexQ(pat, _) =>
      // anchored whole-term match, like RegexTermEnum
      terms.keysIterator.exists(_.matches(pat))
    case TermRangeQ(lo, hi, incLo, incHi, _, coll) =>
      // collated variant: same ICU locale semantics as the Searcher
      val cmp: (String, String) => Int = coll match {
        case Some(c) =>
          val ic = java.text.Collator.getInstance(
            java.util.Locale.forLanguageTag(c))
          (a, b) => ic.compare(a, b)
        case None => (a, b) => a.compareTo(b)
      }
      terms.keysIterator.exists { t =>
        lo.forall(l => if (incLo) cmp(t, l) >= 0 else cmp(t, l) > 0) &&
          hi.forall(h => if (incHi) cmp(t, h) <= 0 else cmp(t, h) < 0)
      }
    case FuzzyQ(t, maxEdits) =>
      // the Searcher's positive-similarity exclusion mirrored: a term
      // whose distance reaches min length (sim <= 0) never matches
      terms.keysIterator.exists { c =>
        val d = editDistance(t, c)
        d <= maxEdits && d < math.min(c.length, t.length)
      }
    case KeywordQ(f, v) => fields.get(f).contains(v)
    case SpanNearQ(a, b, slop, inOrder) =>
      val pa = terms.getOrElse(a, Vector.empty)
      val pb = terms.getOrElse(b, Vector.empty)
      def ord(x: Vector[Int], y: Vector[Int]) =
        x.exists(p => y.exists(q => q > p && q - p - 1 <= slop))
      if (inOrder) ord(pa, pb) else ord(pa, pb) || ord(pb, pa)
    case other => throw new UnsupportedOperationException(
      s"percolation does not support ${other.getClass.getSimpleName}")
  }

  /** Single-doc relevance — the reference MemoryIndex float score
    * (`MemoryIndex.cs:97` Search over the one-doc RAM index). The
    * document is its own corpus: numDocs = 1, every present term's
    * df = 1, avgdl = this doc's length — so the engine's scoring math
    * applies verbatim with those stats, and MemoryIndexSpec validates
    * the way the reference's own TestMemoryIndex does: score equality
    * against a REAL one-doc index (the distributed Searcher over a
    * singleton corpus). None = no match. Defined for the
    * percolation-relevant scoring subset (term / bool / boost /
    * constant / keyword / dismax / phrase); other operators throw like
    * [[matches]] does for scoring-only constructs. */
  def score(q: Query, sim: Similarity = Bm25Sim): Option[Double] = {
    val len: Long = terms.valuesIterator.map(_.size.toLong).sum
    val avgdl = len.toDouble
    val idf1 = sim.idf(1L, 1L)
    def sc(q: Query): Option[Double] = q match {
      case TermQ(t) =>
        terms.get(t).map(ps =>
          idf1 * sim.tfNormD(ps.size.toDouble, len, avgdl))
      case MatchAllQ => Some(1.0)
      case MatchNoneQ => None
      case KeywordQ(f, v) =>
        if (fields.get(f).contains(v)) Some(1.0) else None
      case ConstantScoreQ(sub, s) => if (matches(sub)) Some(s) else None
      case BoostQ(sub, b) => sc(sub).map(_ * b)
      case bq: BoolQ =>
        if (!matches(bq)) None
        else {
          // ONE flat fold over must ++ should in clause order — the
          // association the percolateScored oracle's running ordinal
          // sum reproduces exactly (two separate sub-sums would differ
          // in the last ulp for mixed shapes)
          val raw = (bq.must ++ bq.should).map(sc(_).getOrElse(0.0)).sum
          // the engine's boolean coord slot (identity under BM25,
          // overlap/maxOverlap under ClassicSim): overlap = matched
          // positive clauses (all musts match here by construction)
          Some(raw * sim.coordD(
            bq.must.size + bq.should.count(matches),
            bq.must.size + bq.should.size))
        }
      case DisMaxQ(ds, tie) =>
        val hits = ds.flatMap(sc)
        if (hits.isEmpty) None
        else { val mx = hits.max; Some(mx + tie * (hits.sum - mx)) }
      case p: PhraseQ =>
        // every phrase term must be present (the engine's n-way join)
        if (p.terms.exists { case (t, _) => !terms.contains(t) }) None
        else {
          val sumIdf = p.terms.size * idf1
          val off0 = p.terms.head._2
          val pos0 = terms(p.terms.head._1)
          val tfp: Double =
            if (p.slop == 0)
              pos0.count(pp => p.terms.zipWithIndex.tail.forall {
                case ((t, offk), _) => terms(t).contains(pp + offk - off0)
              }).toDouble
            else
              pos0.iterator.map { pp =>
                // per slot: minimal |displacement| among candidates
                // pre-filtered to <= slop (the engine's N-term fold)
                val dists = p.terms.zipWithIndex.tail.map {
                  case ((t, offk), _) =>
                    val gap = offk - off0
                    val cands = terms(t).iterator
                      .map(j => math.abs(j - pp - gap))
                      .filter(_ <= p.slop)
                    if (cands.isEmpty) Double.NaN else cands.min.toDouble
                }
                val total = dists.sum
                if (total.isNaN || total > p.slop) 0.0
                else 1.0 / (total + 1.0)
              }.sum
          if (tfp > 0) Some(sumIdf * sim.tfNormD(tfp, len, avgdl))
          else None
        }
      case other => throw new UnsupportedOperationException(
        s"single-doc scoring does not support " +
          s"${other.getClass.getSimpleName}")
    }
    sc(q)
  }
}

object MemoryIndex {
  /** Analyze one document (any analyzer kind) into a MemoryIndex. */
  def of(text: String,
      kind: Analyzers.Kind = Analyzers.Standard,
      fields: Map[String, String] = Map.empty): MemoryIndex = {
    val toks = Analyzers.tokenize(kind, text)
    MemoryIndex(
      toks.groupBy(_.term).map { case (t, occ) => t -> occ.map(_.pos) },
      fields)
  }
}
