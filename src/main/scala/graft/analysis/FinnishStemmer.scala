package graft.analysis

/** Finnish stemmer, implemented from the published Snowball Finnish
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/FinnishStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39 — the generated code's among
  * tables were consulted only to confirm the published suffix sets; the
  * implementation below is the string-based structure shared by this
  * package's other stemmers, not the generated cursor machine.
  *
  * Outline (R1/R2 standard, no minimum adjustment):
  *  step 1. particles: kin/kaan/kään/ko/kö/han/hän/pa/pä in R1 after a
  *          particle-ending char (n, t or a vowel) → delete; sti in R2
  *          → delete.
  *  step 2. possessives in R1: nsa/nsä/mme/nne; si (not after k); ni
  *          (then kse → ksi); an/än/en gated on the preceding case
  *          ending.
  *  step 3. cases in R1: harmony-vowel hXn forms, seen after a LONG
  *          vowel, siin/den/tten after Vi, a/ä after
  *          consonant-vowel, tta/ttä after e, the plain
  *          ta/ssa/…/ksi/ine set, and n (which also takes a preceding
  *          LONG/ie vowel). Removal here arms step 5's i/j branch.
  *  step 4. comparatives in R2: mpi/mpa/mpä/mmi/mma/mmä (not after
  *          po), impi/…/eja/ejä.
  *  step 5. plurals: final i/j in R1 if step 3 removed an ending;
  *          otherwise final t in R1 after a vowel, then mma/imma in
  *          R2 (mma not after po).
  *  step 6. tidying, in turn: LONG in R1 loses a letter; final
  *          a/ä/e/i after a consonant in R1 drops; oj/uj and jo in R1
  *          drop the last letter; a final double consonant (before any
  *          trailing vowels) undoubles.
  */
object FinnishStemmer {

  private val Vowels = "aeiouyäö".toSet
  /** Restricted vowels (the Vi condition excludes y). */
  private val RestrictedV = "aeiouäö".toSet
  private val Long = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")
  private val AEI = "aäei".toSet
  private val ParticleEnd = Vowels ++ Set('n', 't')

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

    val (r1, r2) = {
      var j = 0
      while (j < s.length && !isVowel(s(j))) j += 1
      while (j < s.length && isVowel(s(j))) j += 1
      val p1 = if (j < s.length) j + 1 else s.length
      j = p1
      while (j < s.length && !isVowel(s(j))) j += 1
      while (j < s.length && isVowel(s(j))) j += 1
      val p2 = if (j < s.length) j + 1 else s.length
      (p1, p2)
    }
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2
    def del(n: Int): Unit = s = s.substring(0, s.length - n)
    def before(sufLen: Int, back: Int): Option[Char] = {
      val i = s.length - sufLen - back
      if (i >= 0) Some(s(i)) else None
    }
    def prefixEndsWith(sufLen: Int, p: String): Boolean =
      s.substring(0, s.length - sufLen).endsWith(p)

    // ---- step 1: particles ----
    val particles = Seq("kaan", "kään", "kin", "han", "hän", "sti",
      "ko", "kö", "pa", "pä")
    particles.filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption.foreach {
        case "sti" => if (inR2(3)) del(3)
        case p =>
          if (before(p.length, 1).exists(ParticleEnd)) del(p.length)
      }

    // ---- step 2: possessives ----
    val poss = Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
    poss.filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption.foreach {
        case p @ ("nsa" | "nsä" | "mme" | "nne") => del(p.length)
        case "si" => if (!before(2, 1).contains('k')) del(2)
        case "ni" =>
          del(2)
          if (s.endsWith("kse")) s = s.substring(0, s.length - 1) + "i"
        case "an" =>
          if (Seq("ta", "ssa", "sta", "lla", "lta", "na")
            .exists(prefixEndsWith(2, _))) del(2)
        case "än" =>
          if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä")
            .exists(prefixEndsWith(2, _))) del(2)
        case "en" =>
          if (Seq("lle", "ine").exists(prefixEndsWith(2, _))) del(2)
        case _ => ()
      }

    // ---- step 3: cases ----
    var removed = false
    val harmony = Map("han" -> 'a', "hen" -> 'e', "hin" -> 'i',
      "hon" -> 'o', "hän" -> 'ä', "hön" -> 'ö')
    val plainCases = Set("ta", "tä", "ssa", "ssä", "sta", "stä", "lla",
      "llä", "lta", "ltä", "lle", "na", "nä", "ksi", "ine")
    val cases = Seq("seen", "tten", "siin", "den", "han", "hen", "hin",
      "hon", "hän", "hön", "tta", "ttä", "ssa", "ssä", "sta", "stä",
      "lla", "llä", "lta", "ltä", "lle", "ksi", "ine", "ta", "tä",
      "na", "nä", "a", "ä", "n")
    cases.filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption.foreach {
        case p if harmony.contains(p) =>
          if (before(3, 1).contains(harmony(p))) { del(3); removed = true }
        case "seen" =>
          val pre = s.substring(0, s.length - 4)
          if (pre.length >= 2 && Long(pre.takeRight(2))) {
            del(4); removed = true
          }
        case p @ ("siin" | "den" | "tten") =>
          // preceded by Vi: a restricted vowel then i
          if (before(p.length, 1).contains('i') &&
            before(p.length, 2).exists(RestrictedV)) {
            del(p.length); removed = true
          }
        case p @ ("a" | "ä") =>
          // preceded by cv
          if (before(1, 1).exists(isVowel) &&
            before(1, 2).exists(c => !isVowel(c))) {
            del(1); removed = true
          }
        case p @ ("tta" | "ttä") =>
          if (before(3, 1).contains('e')) { del(3); removed = true }
        case p if plainCases(p) => del(p.length); removed = true
        case "n" =>
          del(1); removed = true
          if (s.length >= 2 &&
            (Long(s.takeRight(2)) || s.endsWith("ie"))) del(1)
        case _ => ()
      }

    // ---- step 4: other endings (comparatives) ----
    val other = Seq("impi", "impa", "impä", "immi", "imma", "immä",
      "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä")
    other.filter(p => s.endsWith(p) && inR2(p.length))
      .sortBy(-_.length).headOption.foreach {
        case p @ ("mpi" | "mpa" | "mpä" | "mmi" | "mma" | "mmä") =>
          if (!prefixEndsWith(p.length, "po")) del(p.length)
        case p => del(p.length)
      }

    // ---- step 5: plurals ----
    if (removed) {
      if ((s.endsWith("i") || s.endsWith("j")) && inR1(1)) del(1)
    } else if (s.endsWith("t") && inR1(1) && before(1, 1).exists(isVowel)) {
      del(1)
      if (s.endsWith("imma") && inR2(4)) del(4)
      else if (s.endsWith("mma") && inR2(3) && !prefixEndsWith(3, "po"))
        del(3)
    }

    // ---- step 6: tidying (each sub-step in turn) ----
    if (s.length >= 2 && inR1(2) && Long(s.takeRight(2))) del(1)
    if (s.length >= 2 && inR1(1) && AEI(s.last) &&
      !isVowel(s(s.length - 2))) del(1)
    if (inR1(2) && (s.endsWith("oj") || s.endsWith("uj"))) del(1)
    if (inR1(2) && s.endsWith("jo")) del(1)
    // undouble a final double consonant before any trailing vowels
    var i = s.length - 1
    while (i >= 0 && isVowel(s(i))) i -= 1
    if (i >= 1 && !isVowel(s(i)) && s(i) == s(i - 1))
      s = s.substring(0, i) + s.substring(i + 1)
    s
  }
}
