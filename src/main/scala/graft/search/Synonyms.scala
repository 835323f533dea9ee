package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WordNet contrib analog (SynExpand.cs:77-130, Syns2Index.cs,
  * SynLookup.cs): synonym-expanded querying.
  *
  * The reference stores WordNet's prolog synonym data as a tiny Lucene
  * index (word → syn fields) and expands a user query into one flat
  * BooleanQuery of SHOULD clauses — each analyzed query word, plus each
  * not-yet-seen synonym with an optional boost (0.9 in the reference's
  * own driver). Spark-first: the synonym table is a (word, syns)
  * DataFrame persisted as parquet; at query time it is loaded once into
  * a driver-side map (WordNet scale — ~10⁵ rows — is broadcast-sized,
  * exactly like the reference's RAM-resident synonym searcher) and the
  * expansion is a pure AST rewrite the downstream Searcher plans as a
  * single scan.
  */
object Synonyms {

  /** SynExpand.Expand: analyzed unique query words, each followed by
    * its unseen synonyms (boosted when `boost` > 0); a synonym that
    * already appeared — as a query word or an earlier synonym — is not
    * added twice. */
  def expand(query: String, synonyms: Map[String, Seq[String]],
      boost: Double = 0.0): Query = {
    val words = graft.analysis.Analyzer.tokenize(query).map(_.term).distinct
    val already = scala.collection.mutable.LinkedHashSet(words: _*)
    val clauses = scala.collection.mutable.ArrayBuffer.empty[Query]
    words.foreach { w =>
      clauses += TermQ(w)
      synonyms.getOrElse(w, Nil)
        .map(_.toLowerCase(java.util.Locale.ROOT)).foreach { s =>
          if (already.add(s))
            clauses +=
              (if (boost > 0) BoostQ(TermQ(s), boost) else TermQ(s))
        }
    }
    // all-stopword input analyzes to nothing: match nothing, like
    // QueryAst.similarQuery — a clauseless BoolQ would trip the
    // Searcher's "empty BooleanQuery" require
    if (clauses.isEmpty) MatchNoneQ else BoolQ(should = clauses.toSeq)
  }

  /** Syns2Index analog: persist the synonym map as a parquet table
    * (word, syns). */
  def write(spark: SparkSession, path: String,
      syns: Map[String, Seq[String]]): Unit = {
    import spark.implicits._
    syns.toSeq.toDF("word", "syns").repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a persisted synonym table into the driver-side map `expand`
    * consumes (SynLookup shape). */
  def load(spark: SparkSession, path: String): Map[String, Seq[String]] =
    spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  /** Raw synonym table for set-oriented joins (e.g. expanding a term
    * column in a query log — the 100 TB path where a driver map would
    * not apply). */
  def table(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
