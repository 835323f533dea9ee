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

  /** SuggestSimilar with a pluggable [[StringDistance]] — the
    * SpellChecker.cs:106 + SuggestWordQueue.cs:28 shape: trigram join
    * bounds the candidate set, the strategy scores each candidate in
    * [0,1], results rank by (score desc, df desc, term asc) and cut at
    * `minSim` (the reference's `accuracy`/minScore, default 0.5).
    *
    * LevenshteinSim stays a native column expression (codegen,
    * whole-stage) — 1 − levenshtein/maxlen is expressible in-plan.
    * Other strategies run as a typed map over the ALREADY-BOUNDED
    * candidate set, so the scalar cost is O(|candidates|) per query,
    * never O(|dict|). Scores are rounded to 6 decimals so the gate
    * hash is stable across engines. */
  def suggestSimilar(idx: InvertedIndex, query: String,
      dist: StringDistance = LevenshteinSim, minSim: Double = 0.5,
      k: Int = 5): DataFrame = {
    val spark = idx.termDict.sparkSession
    import spark.implicits._
    val cands = trigramCandidates(idx, query)
    val scored = dist match {
      case LevenshteinSim =>
        cands.withColumn("score",
          lit(1.0) - levenshtein(col("term"), lit(query)) /
            greatest(length(col("term")), lit(query.length))
              .cast("double"))
      case d =>
        cands.select(col("term"), col("df")).as[(String, Long)]
          .map { case (t, df) => (t, df, d.similarity(t, query)) }
          .toDF("term", "df", "score")
    }
    scored
      .filter(col("score") >= minSim && col("term") =!= query)
      .orderBy(col("score").desc, col("df").desc, col("term").asc)
      .limit(k)
      .select(col("term"), col("df"), round(col("score"), 6).as("score"))
  }

  /** DuckDB twin of [[suggestSimilar]](LevenshteinSim) — same trigram
    * candidate CTE, same 1 − lev/maxlen scalar (both engines compute
    * the identical small-integer division, so round(…, 6) hashes
    * equal). */
  def oracleSqlSimilar(query: String, minSim: Double, k: Int): String = {
    val q = query.replace("'", "''")
    s"""cand AS (
       |  SELECT DISTINCT d.term, d.df
       |  FROM (SELECT term, df,
       |          unnest(list_transform(generate_series(1, greatest(length(term) - 2, 1)),
       |            i -> substr(term, i, 3))) AS g
       |        FROM dict) d
       |  WHERE d.g IN (SELECT unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(length('$q') - 2, 1)),
       |    i -> substr('$q', i, 3)))))),
       |simscored AS (
       |  SELECT term, df,
       |         1.0 - levenshtein(term, '$q') /
       |           CAST(greatest(length(term), length('$q')) AS DOUBLE) AS score
       |  FROM cand)
       |SELECT term, df, round(score, 6) AS score
       |FROM simscored
       |WHERE score >= $minSim AND term != '$q'
       |ORDER BY score DESC, df DESC, term ASC
       |LIMIT $k""".stripMargin
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
