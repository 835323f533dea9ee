package graft.analysis

/** German stemmer, implemented from the published Snowball German
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description) — NOT a port of the reference's GermanStemmer
  * (/root/reference/src/contrib/Analyzers/De/GermanStemmer.cs:34 is the
  * older Lucene recursive-strip design with a substitution table; the
  * Snowball formulation is the published successor the reference's
  * contrib/Snowball assembly wraps, SnowballAnalyzer.cs:39).
  *
  * Algorithm outline (regions R1/R2 as in Porter's framework):
  *  0. ß → ss; u/y between vowels marked as consonants (upper case).
  *  1. strip declension suffixes (em/ern/er | e/en/es [+niss→nis] |
  *     s after a valid s-ending) in R1.
  *  2. strip en/er/est in R1; st after a valid st-ending with ≥3
  *     letters before it.
  *  3. strip derivational suffixes (end/ung, ig/ik/isch, lich/heit,
  *     keit) with their R2/R1 side conditions.
  *  4. unmark consonant u/y, remove umlauts.
  */
object GermanStemmer {

  private val Vowels = "aeiouyäöü".toSet
  private val SEnding = "bdfghklmnrt".toSet
  private val StEnding = "bdfghklmnt".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  /** Start of the region after the first non-vowel following a vowel,
    * scanning from `from`; length of s when absent. */
  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  /** Mark u/y between vowels as consonants (shared prelude piece). */
  private[analysis] def markUY(s: String): String = {
    val a = s.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if ((a(i) == 'u' || a(i) == 'y') && isVowel(a(i - 1)) && isVowel(a(i + 1)))
        a(i) = a(i).toUpper
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = {
    if (word == null || word.length < 2) return if (word == null) "" else word
    steps(markUY(word.toLowerCase(java.util.Locale.ROOT).replace("ß", "ss")))
  }

  /** Steps 1-3 + finalize, on a post-prelude (marked) word — shared
    * with [[German2Stemmer]], whose prelude additionally folds
    * ae/oe/ue; every rule from here on is identical between the two
    * published algorithms. */
  private[analysis] def steps(marked: String): String = {
    var s = marked
    val r1 = math.max(regionAfter(s, 0), 3)
    val r2 = regionAfter(s, r1)

    def inR1(suffixStart: Int) = suffixStart >= r1
    def inR2(suffixStart: Int) = suffixStart >= r2

    // ---- step 1: longest among em ern er | e en es | s ----
    val step1 = Seq("ern", "em", "er", "en", "es", "e", "s")
    step1.filter(s.endsWith).sortBy(-_.length).headOption.foreach { suf =>
      val p = s.length - suf.length
      suf match {
        case "em" | "ern" | "er" =>
          if (inR1(p)) s = s.substring(0, p)
        case "e" | "en" | "es" =>
          if (inR1(p)) {
            s = s.substring(0, p)
            if (s.endsWith("niss")) s = s.substring(0, s.length - 1)
          }
        case "s" =>
          if (inR1(p) && p > 0 && SEnding(s(p - 1))) s = s.substring(0, p)
      }
    }

    // ---- step 2: longest among en er est | st ----
    val step2 = Seq("est", "en", "er", "st")
    step2.filter(s.endsWith).sortBy(-_.length).headOption.foreach { suf =>
      val p = s.length - suf.length
      suf match {
        case "en" | "er" | "est" =>
          if (inR1(p)) s = s.substring(0, p)
        case "st" =>
          // valid st-ending itself preceded by at least 3 letters
          if (inR1(p) && p > 3 && StEnding(s(p - 1))) s = s.substring(0, p)
      }
    }

    // ---- step 3: d-suffixes ----
    val step3 = Seq("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")
    step3.filter(s.endsWith).sortBy(-_.length).headOption.foreach { suf =>
      val p = s.length - suf.length
      suf match {
        case "end" | "ung" =>
          if (inR2(p)) {
            s = s.substring(0, p)
            // a preceding ig (not itself preceded by e) falls too
            if (s.endsWith("ig") && inR2(s.length - 2) &&
                !(s.length > 2 && s(s.length - 3) == 'e'))
              s = s.substring(0, s.length - 2)
          }
        case "ig" | "ik" | "isch" =>
          if (inR2(p) && !(p > 0 && s(p - 1) == 'e')) s = s.substring(0, p)
        case "lich" | "heit" =>
          if (inR2(p)) {
            s = s.substring(0, p)
            if ((s.endsWith("er") || s.endsWith("en")) && inR1(s.length - 2))
              s = s.substring(0, s.length - 2)
          }
        case "keit" =>
          if (inR2(p)) {
            s = s.substring(0, p)
            if (s.endsWith("lich") && inR2(s.length - 4))
              s = s.substring(0, s.length - 4)
            else if (s.endsWith("ig") && inR2(s.length - 2))
              s = s.substring(0, s.length - 2)
          }
      }
    }

    // ---- finalize: unmark consonants, strip umlauts ----
    s.map {
      case 'U' => 'u'
      case 'Y' => 'y'
      case 'ä' => 'a'
      case 'ö' => 'o'
      case 'ü' => 'u'
      case c => c
    }
  }
}
