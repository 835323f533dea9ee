package graft.analysis

/** Norwegian (Bokmål) stemmer, implemented from the published Snowball
  * Norwegian stemming algorithm (M.F. Porter's Snowball project, public
  * algorithm description). The reference ships the Snowball-generated
  * equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/NorwegianStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39.
  *
  * Outline (single region R1 with the Scandinavian min-3 adjustment,
  * shared with [[SwedishStemmer]]/[[DanishStemmer]]):
  *  step 1. longest ending in R1 among: the a/e/ede/heten… set →
  *          delete; erte/ert → replace with er; final s after a valid
  *          s-ending (k counts only when NOT preceded by a vowel) →
  *          delete.
  *  step 2. final dt/vt in R1 → delete the last letter.
  *  step 3. longest of leg/eleg/ig/eig/lig/elig/els/lov/elov/slov/
  *          hetslov in R1 → delete. (No undouble step — Norwegian keeps
  *          katt where Danish yields kat.)
  */
object NorwegianStemmer {

  private val Vowels = "aeiouyæåø".toSet
  /** Valid s-endings minus the conditional k (step 1 s-deletion gate). */
  private val SEnding = "bcdfghjlmnoprtvyz".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private val Step1Delete = Seq(
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast")

  private val Step3 = Seq(
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov")

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

    val r1 = {
      var i = 0
      while (i < s.length && !isVowel(s(i))) i += 1
      while (i < s.length && isVowel(s(i))) i += 1
      val r = if (i < s.length) i + 1 else s.length
      math.max(r, 3)
    }
    def inR1(n: Int) = s.length - n >= r1
    def del(n: Int): Unit = s = s.substring(0, s.length - n)

    // s is valid for deletion after the fixed consonant set, or after a
    // k that is itself not preceded by a vowel
    def validS: Boolean = {
      val c = s(s.length - 2)
      SEnding(c) || (c == 'k' && (s.length < 3 || !isVowel(s(s.length - 3))))
    }

    // ---- step 1: ONE longest match across all three branches ----
    val cands =
      Step1Delete.filter(p => s.endsWith(p) && inR1(p.length))
        .map(p => (p, 'd')) ++
        Seq("erte", "ert").filter(p => s.endsWith(p) && inR1(p.length))
          .map(p => (p, 'r')) ++
        (if (s.endsWith("s") && inR1(1) && s.length >= 2) Seq(("s", 's'))
         else Nil)
    cands.sortBy(-_._1.length).headOption.foreach {
      case (p, 'd') => del(p.length)
      case (p, 'r') => s = s.substring(0, s.length - p.length) + "er"
      case (_, _)   => if (validS) del(1) // a failed s-condition ends step 1
    }

    // ---- step 2 ----
    Seq("dt", "vt").find(p => s.endsWith(p) && inR1(2)).foreach(_ => del(1))

    // ---- step 3 ----
    Step3.filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption.foreach(p => del(p.length))
    s
  }
}
