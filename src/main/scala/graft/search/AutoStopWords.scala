package graft.search

import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.index.InvertedIndex

/** QueryAutoStopWordAnalyzer analog (/root/reference/src/contrib/
  * Analyzers/Query/QueryAutoStopWordAnalyzer.cs): the stop set is not a
  * fixed list but DERIVED from the index — any term occurring in more
  * than maxDocFreqFraction of documents is stopped at QUERY time (the
  * index keeps them; only queries skip them, exactly the reference's
  * wrap-the-query-analyzer behavior). Zipf keeps the set tiny, so it
  * collects to the driver like the reference materializes it per
  * field. */
object AutoStopWords {

  /** Terms with df > maxDocFreqFraction × numDocs (truncated — the
    * reference compares df > maxDocFreq after the same integer floor).
    * One pushed-down dictionary filter; no postings touched. */
  def stopSet(idx: InvertedIndex, maxDocFreqFraction: Double): Set[String] = {
    val cap = (idx.numDocs * maxDocFreqFraction).toLong
    idx.termDict.filter(col("df") > cap)
      .select("term").collect().map(_.getString(0)).toSet
  }

  /** Analyze a query string with the derived set applied on top of the
    * Standard chain: surviving terms become the usual SHOULD bag;
    * everything stopped → MatchNoneQ (the Synonyms.expand convention). */
  def query(input: String, stops: Set[String]): Query = {
    val terms = Analyzer.analyzeQuery(input).filterNot(stops)
    if (terms.isEmpty) MatchNoneQ
    else if (terms.size == 1) TermQ(terms.head)
    else BoolQ(should = terms.map(TermQ(_)))
  }
}
