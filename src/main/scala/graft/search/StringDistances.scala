package graft.search

/** Pluggable string-similarity strategy for the spell checker — the
  * StringDistance.cs:28 contract: returns a value in [0, 1] where 1 =
  * identical and 0 = maximally different. Similarities run per
  * candidate AFTER the trigram join bounds the candidate set, so the
  * scalar cost is O(|candidates|), never O(|dict|).
  */
sealed trait StringDistance extends Serializable {
  def similarity(a: String, b: String): Double
}

object StringDistances {
  /** Two-row Levenshtein DP — the ONE int edit-distance kernel
    * (LevenshteinDistance.cs:38-115), shared by [[LevenshteinSim]] and
    * [[MemoryIndex]]'s FuzzyQ membership so the two can never diverge. */
  def editDistance(a: String, b: String): Int = {
    var prev = Array.tabulate(a.length + 1)(identity)
    var cur = new Array[Int](a.length + 1)
    for (j <- 1 to b.length) {
      cur(0) = j
      for (i <- 1 to a.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1),
          prev(i - 1) + cost)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(a.length)
  }
}

/** LevenshteinDistance.cs:38-115 — 1 − editDistance / max(|a|, |b|).
  * This one is expressible natively (Spark `levenshtein`, DuckDB
  * `levenshtein`), so [[graft.search.Suggest.suggestSimilar]] keeps it
  * in codegen instead of calling this scalar. */
case object LevenshteinSim extends StringDistance {
  def similarity(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return if (a == b) 1.0 else 0.0
    1.0 - StringDistances.editDistance(a, b).toDouble /
      math.max(a.length, b.length)
  }
}

/** JaroWinklerDistance.cs:26-123 — Jaro similarity (match window =
  * ⌊max/2⌋−1, transpositions = half the out-of-order matches) with the
  * Winkler common-prefix bonus applied only above threshold 0.7.
  * Deviation from the textbook variant, mirrored from the reference:
  * the FULL common prefix is scaled by min(0.1, 1/|max|) — no 4-char
  * prefix cap. The two agree whenever the shorter string is ≤ 4 chars
  * (the prefix cannot exceed it), which is what makes a 4-char query
  * exactly replayable by DuckDB's capped `jaro_winkler_similarity`. */
case object JaroWinklerSim extends StringDistance {
  private val Threshold = 0.7
  def similarity(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val (mx, mn) = if (s1.length > s2.length) (s1, s2) else (s2, s1)
    val range = math.max(mx.length / 2 - 1, 0)
    val flags = new Array[Boolean](mx.length)
    val matchedMin = new StringBuilder
    for (mi <- mn.indices) {
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, mx.length)
      var found = false
      while (xi < xn && !found) {
        if (!flags(xi) && mn(mi) == mx(xi)) {
          flags(xi) = true; matchedMin += mn(mi); found = true
        }
        xi += 1
      }
    }
    val m = matchedMin.length.toDouble
    if (m == 0) return 0.0
    val matchedMax = mx.indices.filter(flags).map(mx)
    val trans =
      matchedMin.zip(matchedMax).count { case (x, y) => x != y } / 2
    val prefix = mn.indices.takeWhile(i => s1(i) == s2(i)).size
    val j = (m / s1.length + m / s2.length + (m - trans) / m) / 3
    if (j < Threshold) j
    else j + math.min(0.1, 1.0 / mx.length) * prefix * (1 - j)
  }
}

/** NGramDistance.cs:33-161 — Kondrak's N-GRAM distance (2005): an
  * edit-distance DP over positional n-grams of the two strings, each
  * string prefixed with n−1 null sentinels; substitution cost of a
  * gram pair = fraction of mismatched characters, with null-sentinel
  * positions that DO match discounted from the denominator. Similarity
  * = 1 − DP(|a|,|b|) / max(|a|, |b|). Strings shorter than n fall back
  * to positional character overlap. */
final case class NGramSim(n: Int = 2) extends StringDistance {
  require(n >= 1, "n-gram size must be >= 1")
  def similarity(source: String, target: String): Double = {
    val sl = source.length
    val tl = target.length
    if (sl == 0 || tl == 0) return if (sl == tl) 1.0 else 0.0
    if (sl < n || tl < n) {
      val matches =
        (0 until math.min(sl, tl)).count(i => source(i) == target(i))
      return matches.toDouble / math.max(sl, tl)
    }
    // source padded with n-1 sentinels so gram i covers sa[i, i+n)
    val sa = new Array[Char](sl + n - 1)
    for (i <- sa.indices)
      sa(i) = if (i < n - 1) '\u0000' else source(i - n + 1)
    var prev = Array.tabulate(sl + 1)(_.toDouble)
    var cur = new Array[Double](sl + 1)
    val tj = new Array[Char](n)
    for (j <- 1 to tl) {
      if (j < n) {
        for (ti <- 0 until n - j) tj(ti) = '\u0000'
        for (ti <- n - j until n) tj(ti) = target(ti - (n - j))
      } else {
        for (ti <- 0 until n) tj(ti) = target(j - n + ti)
      }
      cur(0) = j
      for (i <- 1 to sl) {
        var cost = 0
        var tn = n
        for (ni <- 0 until n) {
          if (sa(i - 1 + ni) != tj(ni)) cost += 1
          else if (sa(i - 1 + ni) == '\u0000') tn -= 1
        }
        val ec = cost.toDouble / tn
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1),
          prev(i - 1) + ec)
      }
      val t = prev; prev = cur; cur = t
    }
    1.0 - prev(sl) / math.max(tl, sl)
  }
}
