package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.InvertedIndex

/** Spell-suggest over the term dictionary (reference contrib
  * SpellChecker.cs:60: an n-gram index generates candidates, string
  * distance ranks them).
  *
  * Scale shape matches the reference exactly: candidates come from a
  * TRIGRAM JOIN against the dictionary (never a full-dict levenshtein
  * scan — at 10^9 terms that scan is the thing the n-gram index exists
  * to avoid); only candidates sharing ≥1 trigram with the query are
  * distance-verified. Ranking: edit distance asc, df desc (popular terms
  * win), term asc — deterministic. */
object Suggest {

  def trigramsOf(s: String): Seq[String] =
    if (s.length < 3) Seq(s) else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** Dictionary terms sharing >=1 trigram with the query: (term, df).
    * The candidate generator for both Suggest and FuzzyQ. */
  def trigramCandidates(idx: InvertedIndex, query: String): DataFrame = {
    val qgrams = trigramsOf(query).distinct
    idx.termDict
      .select(col("term"), col("df"),
        explode(transform(
          sequence(lit(0), greatest(length(col("term")) - 3, lit(0))),
          i => col("term").substr(i + lit(1), lit(3)))).as("g"))
      .filter(col("g").isin(qgrams: _*))
      .select(col("term"), col("df")).distinct()
  }

  def suggest(idx: InvertedIndex, query: String, maxEdits: Int = 2,
      k: Int = 5): DataFrame = {
    val candidates = trigramCandidates(idx, query)
    candidates
      .withColumn("dist", levenshtein(col("term"), lit(query)))
      .filter(col("dist") <= maxEdits && col("term") =!= query)
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("df"), col("dist").cast("int").as("dist"))
  }

  /** DuckDB twin of [[suggest]] (assumes the `dict` CTE is in scope). */
  def oracleSql(query: String, maxEdits: Int, k: Int): String = {
    val q = query.replace("'", "''")
    s"""cand AS (
       |  SELECT DISTINCT d.term, d.df
       |  FROM (SELECT term, df,
       |          unnest(list_transform(generate_series(1, greatest(length(term) - 2, 1)),
       |            i -> substr(term, i, 3))) AS g
       |        FROM dict) d
       |  WHERE d.g IN (SELECT unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(length('$q') - 2, 1)),
       |    i -> substr('$q', i, 3))))))
       |SELECT term, df, CAST(levenshtein(term, '$q') AS INTEGER) AS dist
       |FROM cand
       |WHERE levenshtein(term, '$q') <= $maxEdits AND term != '$q'
       |ORDER BY dist ASC, df DESC, term ASC
       |LIMIT $k""".stripMargin
  }
}
