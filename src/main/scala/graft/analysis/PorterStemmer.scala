package graft.analysis

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980 — public algorithm, implemented from
  * the published rule lists including the author's later official
  * departures: bli→ble and logi→log in step 2).
  *
  * Reference analog: PorterStemFilter
  * (/root/reference/src/core/Analysis/PorterStemFilter.cs:42) — the
  * filter slot in the analysis chain; this file implements the algorithm
  * from its publication, not from the reference code.
  */
object PorterStemmer {

  private def isCons(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(s, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in [C](VC)^m[V]. */
  private def measure(s: String): Int = {
    var m = 0
    var i = 0
    val n = s.length
    while (i < n && isCons(s, i)) i += 1 // optional leading C-run
    while (i < n) {
      while (i < n && !isCons(s, i)) i += 1 // V-run
      if (i < n) { // following C-run closes one VC
        while (i < n && isCons(s, i)) i += 1
        m += 1
      }
    }
    m
  }

  private def containsVowel(s: String): Boolean =
    (0 until s.length).exists(i => !isCons(s, i))

  private def endsDoubleCons(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      isCons(s, s.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && isCons(s, s.length - 3) && !isCons(s, s.length - 2) &&
      isCons(s, s.length - 1) && !"wxy".contains(s.charAt(s.length - 1))

  /** Apply the longest matching (suffix → replacement) whose remaining
    * stem satisfies cond; None if no suffix matched at all. */
  private def rule(b: String, rules: Seq[(String, String)],
      cond: String => Boolean): Option[String] = {
    val matching = rules.filter { case (suf, _) => b.endsWith(suf) }
    if (matching.isEmpty) return None
    val (suf, rep) = matching.maxBy(_._1.length)
    val stem = b.dropRight(suf.length)
    Some(if (cond(stem)) stem + rep else b)
  }

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
    "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var b = word

    // step 1a
    if (b.endsWith("sses")) b = b.dropRight(2)
    else if (b.endsWith("ies")) b = b.dropRight(2)
    else if (b.endsWith("ss")) ()
    else if (b.endsWith("s")) b = b.dropRight(1)

    // step 1b
    var cleanup = false
    if (b.endsWith("eed")) {
      if (measure(b.dropRight(3)) > 0) b = b.dropRight(1)
    } else if (b.endsWith("ed") && containsVowel(b.dropRight(2))) {
      b = b.dropRight(2); cleanup = true
    } else if (b.endsWith("ing") && containsVowel(b.dropRight(3))) {
      b = b.dropRight(3); cleanup = true
    }
    if (cleanup) {
      if (b.endsWith("at") || b.endsWith("bl") || b.endsWith("iz")) b += "e"
      else if (endsDoubleCons(b) && !"lsz".contains(b.charAt(b.length - 1)))
        b = b.dropRight(1)
      else if (measure(b) == 1 && endsCvc(b)) b += "e"
    }

    // step 1c
    if (b.endsWith("y") && containsVowel(b.dropRight(1)))
      b = b.dropRight(1) + "i"

    // step 2 (m > 0)
    b = rule(b, step2Rules, s => measure(s) > 0).getOrElse(b)
    // step 3 (m > 0)
    b = rule(b, step3Rules, s => measure(s) > 0).getOrElse(b)
    // step 4 (m > 1; "ion" additionally requires stem ending s or t)
    b = rule(b, step4Suffixes.map(s => s -> ""), s => measure(s) > 1)
      match {
        case Some(r)
            if b.endsWith("ion") && r == b.dropRight(3) &&
              !(r.endsWith("s") || r.endsWith("t")) =>
          b // ion matched+stripped but s/t condition fails → keep
        case Some(r) => r
        case None => b
      }

    // step 5a
    if (b.endsWith("e")) {
      val stem = b.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) b = stem
    }
    // step 5b
    if (measure(b) > 1 && endsDoubleCons(b) && b.endsWith("l"))
      b = b.dropRight(1)
    b
  }
}
