package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BM25 scoring (k1=1.2, b=0.75) as Catalyst column expressions.
  *
  * The reference exposes scoring as a pluggable Similarity strategy
  * (/root/reference/src/core/Search/Similarity.cs:398-503); BM25 drops
  * into the same tf/idf/length-norm slots. Formula per Lucene's published
  * BM25Similarity (Robertson/Spärck Jones):
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   norm(d) = k1 * (1 - b + b * |d| / avgdl)
  *   score   = idf * tf * (k1+1) / (tf + norm)
  * Exact integer doc lengths replace the reference's lossy norm byte
  * (SmallFloat.FloatToByte315, Similarity.cs:501-503) — see SURVEY §1.1.
  *
  * Operand order is kept IDENTICAL between these expressions and the
  * DuckDB oracle SQL (graft.OracleSql) so both engines produce the same
  * doubles bar 1-ulp libm ln() differences (absorbed by round(.,4)).
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  def idfCol(numDocs: Long, df: Column): Column =
    log(lit(1.0) + (lit(numDocs.toDouble) - df + lit(0.5)) / (df + lit(0.5)))

  def idf(numDocs: Long, df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  /** tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl)); tf may be fractional
    * (sloppy-phrase freq, SloppyPhraseScorer.cs / DefaultSimilarity.cs:69). */
  def tfNorm(tf: Column, len: Column, avgdl: Double): Column =
    (tf * lit(K1 + 1)) /
      (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * len / lit(avgdl)))

  def score(numDocs: Long, avgdl: Double, df: Column, tf: Column,
      len: Column): Column =
    idfCol(numDocs, df) * tfNorm(tf, len, avgdl)
}
