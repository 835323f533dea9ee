package graft.analysis

/** Portuguese stemmer, implemented from the published Snowball
  * Portuguese stemming algorithm (M.F. Porter's Snowball project,
  * public algorithm description). The reference ships the
  * Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/PortugueseStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39.
  *
  * Outline:
  *  prelude.  nasal vowels are split (ã → a~, õ → o~) so the region
  *            scan sees a vowel + a consonant marker; restored at the
  *            end.
  *  regions.  R1/R2 standard; RV with the same three-way rule as
  *            Spanish.
  *  step 1.   standard suffix removal (eza/ico/oso/amento…, aça~o
  *            family, logia→log, uça~o→u, ência→ente, amente/mente,
  *            idade, iva with their R1/R2 side conditions, eira→eir).
  *  step 2.   verb suffixes in RV (only if step 1 changed nothing).
  *  step 3.   final i after c in RV (only if step 1 or 2 changed
  *            something).
  *  step 4.   residual os/a/i/o/á/í/ó in RV (only if steps 1 and 2
  *            changed nothing).
  *  step 5.   final e/é/ê in RV (then gu→g / ci→c squeeze), or final
  *            ç → c. Unlike Spanish, accents are NOT stripped.
  */
object PortugueseStemmer {

  /** Vowels of the marked form ('~' and 'ç' are consonants). */
  private val Vowels = "aeiouáéíóúâêô".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  /** Verb suffixes of step 2, in the marked (a~/o~) form. */
  private val VerbSufs = Seq(
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam",
    "iriam", "aram", "eram", "iram", "avam", "em", "arem", "erem",
    "irem", "assem", "essem", "issem", "ado", "ido", "ando", "endo",
    "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes",
    "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos",
    "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ira", "iras")

  def stem(word: String): String = {
    if (word == null) return ""
    var s = word.toLowerCase(java.util.Locale.ROOT)
      .replace("ã", "a~").replace("õ", "o~")
    if (s.length < 2) return s.replace("a~", "ã").replace("o~", "õ")

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

    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2
    def inRV(n: Int) = s.length - n >= rv
    def del(n: Int): Unit = s = s.substring(0, s.length - n)

    // ---- step 1: standard suffix removal ----
    val g1 = Seq("eza", "ezas", "ico", "ica", "icos", "icas", "ismo",
      "ismos", "ável", "ível", "ista", "istas", "oso", "osa", "osos",
      "osas", "amento", "amentos", "imento", "imentos", "adora", "ador",
      "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância")
    val g3 = Seq("logias", "logia")
    val g4 = Seq("uço~es", "uça~o")
    val g5 = Seq("ências", "ência")
    val g6 = Seq("amente")
    val g7 = Seq("mente")
    val g8 = Seq("idades", "idade")
    val g9 = Seq("ivas", "ivos", "iva", "ivo")
    val g10 = Seq("iras", "ira")
    var step1Removed = false
    def strip(extra: Seq[String]): Unit =
      longest(s, extra).filter(e => inR2(e.length)).foreach(e =>
        del(e.length))
    longest(s, g1 ++ g3 ++ g4 ++ g5 ++ g6 ++ g7 ++ g8 ++ g9 ++ g10)
      .foreach { suf =>
        val n = suf.length
        if (g6.contains(suf)) {
          if (inR1(n)) {
            del(n); step1Removed = true
            if (s.endsWith("iv") && inR2(2)) {
              del(2)
              if (s.endsWith("at") && inR2(2)) del(2)
            } else strip(Seq("os", "ic", "ad"))
          }
        } else if (g7.contains(suf)) {
          if (inR2(n)) {
            del(n); step1Removed = true
            strip(Seq("ante", "avel", "ível"))
          }
        } else if (g10.contains(suf)) {
          // (e)ira(s) → (e)ir: RV-gated, requires the preceding e
          if (inRV(n) && s.length > n &&
            s.charAt(s.length - n - 1) == 'e') {
            del(n); s = s + "ir"; step1Removed = true
          }
        } else if (inR2(n)) {
          del(n); step1Removed = true
          if (g3.contains(suf)) s = s + "log"
          else if (g4.contains(suf)) s = s + "u"
          else if (g5.contains(suf)) s = s + "ente"
          else if (g8.contains(suf)) strip(Seq("abil", "ic", "iv"))
          else if (g9.contains(suf)) strip(Seq("at"))
        }
      }

    // ---- step 2: verb suffixes (only if step 1 changed nothing) ----
    var step2Removed = false
    if (!step1Removed)
      longest(s, VerbSufs).filter(p => inRV(p.length)).foreach { p =>
        del(p.length); step2Removed = true
      }

    // ---- step 3: i after c, in RV ----
    if ((step1Removed || step2Removed) && s.endsWith("ci") && inRV(1))
      del(1)

    // ---- step 4: residual suffix (only if steps 1 and 2 did nothing) --
    if (!step1Removed && !step2Removed)
      longest(s, Seq("os", "a", "i", "o", "á", "í", "ó"))
        .filter(p => inRV(p.length)).foreach(p => del(p.length))

    // ---- step 5: residual form ----
    if ((s.endsWith("e") || s.endsWith("é") || s.endsWith("ê")) &&
      inRV(1)) {
      del(1)
      if ((s.endsWith("gu") || s.endsWith("ci")) && s.length - 1 >= rv)
        del(1)
    } else if (s.endsWith("ç")) s = s.substring(0, s.length - 1) + "c"

    s.replace("a~", "ã").replace("o~", "õ")
  }
}
