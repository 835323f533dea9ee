package graft.analysis

/** Romanian stemmer, implemented from the published Snowball Romanian
  * stemming algorithm (M.F. Porter's Snowball project; the reference
  * ships the Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/RomanianStemmer.cs:11
  * — this uses the same cedilla forms ş/ţ as that generation).
  *
  * Outline:
  *  prelude. i/u between vowels marked I/U (consonants for the tests).
  *  regions. R1/R2 standard; RV with the Romance three-way rule.
  *  step 0.  plural/article removal in R1 (ul/ului deleted, aua→a,
  *           ea/ele/elor→e, ii-family→i, ile→i unless after ab,
  *           atei/aţia/aţie→aţi).
  *  step 1.  combining suffixes, repeated: abilitate-family→abil,
  *           ibilitate→ibil, ivitate-family→iv, ic-family→ic,
  *           at-family (ativ/aţiune/ator…)→at, it-family→it; R1.
  *  step 2.  standard suffixes in R2 (delete list; iune/iuni after ţ →
  *           delete + ţ→t; ism/ist family → "ist").
  *  step 3.  verb suffixes, ONLY when steps 1-2 removed nothing,
  *           bounded to RV (both suffix and condition char): the long
  *           list deletes after a consonant or u; the s-list deletes
  *           unconditionally.
  *  step 4.  final vowel (a/e/i/ie/ă) in RV; postlude unmarks I/U.
  */
object RomanianStemmer {

  private val Vowels = "aăâeiîou".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  /** (suffix, replacement) families; "" = delete. */
  private val Step0: Seq[(String, String)] = Seq(
    "ului" -> "", "ul" -> "",
    "aua" -> "a",
    "elor" -> "e", "ele" -> "e", "ea" -> "e",
    "iilor" -> "i", "ilor" -> "i", "iile" -> "i", "iei" -> "i",
    "iua" -> "i", "ii" -> "i",
    "ile" -> "i", // blocked when preceded by ab
    "atei" -> "aţi", "aţia" -> "aţi", "aţie" -> "aţi")

  private val Combo: Seq[(String, String)] = Seq(
    "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
    "abilităţi" -> "abil",
    "ibilitate" -> "ibil",
    "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv",
    "ivităţi" -> "iv",
    "icitate" -> "ic", "icitati" -> "ic", "icităi" -> "ic",
    "icităţi" -> "ic", "icatori" -> "ic", "icator" -> "ic",
    "iciv" -> "ic", "icive" -> "ic", "icivi" -> "ic", "icivă" -> "ic",
    "ical" -> "ic", "icala" -> "ic", "icale" -> "ic", "icali" -> "ic",
    "icală" -> "ic",
    "ativ" -> "at", "ativa" -> "at", "ative" -> "at", "ativi" -> "at",
    "ativă" -> "at", "aţiune" -> "at", "atoare" -> "at", "ator" -> "at",
    "atori" -> "at", "ătoare" -> "at", "ător" -> "at", "ători" -> "at",
    "itiv" -> "it", "itiva" -> "it", "itive" -> "it", "itivi" -> "it",
    "itivă" -> "it", "iţiune" -> "it", "itoare" -> "it", "itor" -> "it",
    "itori" -> "it")

  private val Step2Delete: Seq[String] = Seq(
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
    "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite",
    "ante", "ute", "ive", "ici", "abili", "ibili", "atori", "osi",
    "ati", "itati", "iti", "anti", "uti", "ivi", "ităi", "oşi",
    "ităţi", "abil", "ibil", "ator", "os", "at", "it", "ant", "ut",
    "iv", "ică", "abilă", "ibilă", "oasă", "ată", "ită", "antă",
    "ută", "ivă")
  private val Step2Iune = Seq("iune", "iuni")
  private val Step2Ist = Seq(
    "ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti")

  /** Verb suffixes deleted after a consonant or u (in RV). */
  private val Verb1: Seq[String] = Seq(
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire", "âre",
    "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai", "eai",
    "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi", "aseşi", "iseşi",
    "useşi", "âseşi", "işi", "uşi", "âşi", "eaţi", "iaţi", "arăţi",
    "aserăţi", "iserăţi", "userăţi", "âserăţi", "irăţi", "urăţi",
    "ârăţi", "am", "eam", "iam", "asem", "isem", "usem", "âsem",
    "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm", "urăm",
    "ârăm", "au", "eau", "iau", "indu", "ându", "ez", "ească", "ară",
    "aseră", "iseră", "useră", "âseră", "iră", "ură", "âră", "ează")
  /** Verb suffixes deleted unconditionally (in RV). */
  private val Verb2: Seq[String] = Seq(
    "se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi", "âţi",
    "serăţi", "seserăţi", "em", "im", "âm", "ăm", "serăm", "seserăm",
    "seră", "seseră")

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // ---- prelude: i/u between vowels → I/U ----
    val a = s.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if ((a(i) == 'i' || a(i) == 'u') &&
        isVowel(a(i - 1)) && isVowel(a(i + 1)))
        a(i) = a(i).toUpper
      i += 1
    }
    s = new String(a)

    // ---- regions ----
    val r1 = regionAfter(s, 0)
    val r2 = regionAfter(s, r1)
    val rv =
      if (s.length < 3) s.length
      else if (!isVowel(s(1))) {
        var j = 2
        while (j < s.length && !isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else if (isVowel(s(0)) && isVowel(s(1))) {
        var j = 2
        while (j < s.length && isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else 3

    def start(suf: String) = s.length - suf.length
    def inR1(suf: String) = start(suf) >= r1
    def inR2(suf: String) = start(suf) >= r2
    def inRV(suf: String) = start(suf) >= rv
    def replace(suf: String, rep: String): Unit =
      s = s.substring(0, start(suf)) + rep

    // ---- step 0 (R1) ----
    longest(s, Step0.map(_._1)).foreach { suf =>
      if (inR1(suf)) {
        val blocked = suf == "ile" && start(suf) >= 2 &&
          s.substring(start(suf) - 2, start(suf)) == "ab"
        if (!blocked) replace(suf, Step0.toMap.apply(suf))
      }
    }

    // ---- step 1: combining suffixes, repeated (R1) ----
    var removed = false
    var changed = true
    while (changed) {
      changed = false
      longest(s, Combo.map(_._1)).foreach { suf =>
        if (inR1(suf)) {
          replace(suf, Combo.toMap.apply(suf))
          removed = true
          changed = true
        }
      }
    }

    // ---- step 2 (R2) ----
    longest(s, Step2Delete ++ Step2Iune ++ Step2Ist).foreach { suf =>
      if (Step2Ist.contains(suf)) {
        if (inR2(suf)) { replace(suf, "ist"); removed = true }
      } else if (Step2Iune.contains(suf)) {
        if (inR2(suf) && start(suf) >= 1 && s(start(suf) - 1) == 'ţ') {
          s = s.substring(0, start(suf) - 1) + "t"
          removed = true
        }
      } else if (inR2(suf)) { replace(suf, ""); removed = true }
    }

    // ---- step 3: verb suffixes, only if steps 1-2 removed nothing;
    // suffix AND condition char bounded to RV ----
    if (!removed) {
      longest(s, Verb1 ++ Verb2).foreach { suf =>
        if (inRV(suf)) {
          if (Verb2.contains(suf)) replace(suf, "")
          else {
            val p = start(suf) - 1
            if (p >= rv && (!isVowel(s(p)) || s(p) == 'u')) replace(suf, "")
          }
        }
      }
    }

    // ---- step 4: final vowel in RV ----
    longest(s, Seq("ie", "a", "e", "i", "ă")).foreach { suf =>
      if (inRV(suf)) replace(suf, "")
    }

    // ---- postlude ----
    s.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }
}
