package graft.analysis

/** Spanish stemmer, implemented from the published Snowball Spanish
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/SpanishStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39 — this is the same PUBLISHED
  * algorithm re-implemented directly, not a port of the generated code.
  *
  * Outline:
  *  regions. R1/R2 standard; RV with the Spanish three-way rule.
  *  step 0.  attached-pronoun removal after gerund/infinitive suffixes
  *           (dándoselo → dando...), un-accenting case-(a) suffixes.
  *  step 1.  standard suffix removal (ico/able/oso/amiento…, logía→log,
  *           ución→u, encia→ente, amente/mente, idad, iva with their
  *           R1/R2 side conditions).
  *  step 2a. verb suffixes beginning y after u (only if step 1 removed
  *           nothing): construyendo → constru.
  *  step 2b. other verb suffixes in RV (en/es/éis/emos also delete a
  *           preceding gu's u: llegues → lleg).
  *  step 3.  residual vowel suffixes in RV; final un-accenting.
  */
object SpanishStemmer {

  private val Vowels = "aeiouáéíóúü".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def unAccent(s: String): String =
    s.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }

  /** Longest suffix of s from `sufs` (longest wins even if its side
    * condition then fails — Snowball `among` semantics). */
  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else unAccent(word.toLowerCase(java.util.Locale.ROOT))
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // ---- regions ----
    val r1 = regionAfter(s, 0)
    val r2 = regionAfter(s, r1)
    val rv =
      if (s.length < 3) s.length
      else if (!isVowel(s(1))) {
        // second letter a consonant: after the next following vowel
        var j = 2
        while (j < s.length && !isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else if (isVowel(s(0)) && isVowel(s(1))) {
        // first two letters vowels: after the next following consonant
        var j = 2
        while (j < s.length && isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else 3 // consonant-vowel: after the third letter

    def inR1(sufLen: Int) = s.length - sufLen >= r1
    def inR2(sufLen: Int) = s.length - sufLen >= r2
    def inRV(sufLen: Int) = s.length - sufLen >= rv
    def del(n: Int): Unit = s = s.substring(0, s.length - n)

    // ---- step 0: attached pronoun ----
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    longest(s, pronouns).foreach { p =>
      val stemPart = s.substring(0, s.length - p.length)
      val aSufs = Seq("iéndo", "ándo", "ár", "ér", "ír")
      val bSufs = Seq("iendo", "ando", "ar", "er", "ir")
      longest(stemPart, aSufs) match {
        case Some(suf) if stemPart.length - suf.length >= rv =>
          s = stemPart.substring(0, stemPart.length - suf.length) +
            unAccent(suf)
        case _ =>
          longest(stemPart, bSufs) match {
            case Some(suf) if stemPart.length - suf.length >= rv =>
              s = stemPart
            case _ =>
              if (stemPart.endsWith("uyendo") &&
                stemPart.length - "yendo".length >= rv)
                s = stemPart
          }
      }
    }

    // ---- step 1: standard suffix removal ----
    val g1 = Seq("amientos", "imientos", "amiento", "imiento", "anzas",
      "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
      "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
    val g2 = Seq("aciones", "adoras", "adores", "ancias", "adora",
      "ación", "antes", "ancia", "ador", "ante")
    val g3 = Seq("logías", "logía")
    val g4 = Seq("uciones", "ución")
    val g5 = Seq("encias", "encia")
    val g6 = Seq("amente")
    val g7 = Seq("mente")
    val g8 = Seq("idades", "idad")
    val g9 = Seq("ivas", "ivos", "iva", "ivo")
    val all = g1 ++ g2 ++ g3 ++ g4 ++ g5 ++ g6 ++ g7 ++ g8 ++ g9
    var step1Removed = false
    longest(s, all).foreach { suf =>
      val n = suf.length
      def strip(extra: Seq[String]): Unit =
        // optional preceding suffix, deleted when itself in R2
        longest(s, extra).filter(e => inR2(e.length)).foreach(e =>
          del(e.length))
      if (g6.contains(suf)) {
        // amente: delete if in R1; then iv (then at) in R2, else
        // os/ic/ad in R2 (region indices are prefix positions, so
        // post-deletion membership is s.length - 2 >= r2)
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
          strip(Seq("ante", "able", "ible"))
        }
      } else if (inR2(n)) {
        del(n); step1Removed = true
        if (g2.contains(suf)) strip(Seq("ic"))
        else if (g3.contains(suf)) s = s + "log"
        else if (g4.contains(suf)) s = s + "u"
        else if (g5.contains(suf)) s = s + "ente"
        else if (g8.contains(suf)) strip(Seq("abil", "ic", "iv"))
        else if (g9.contains(suf)) strip(Seq("at"))
      }
    }

    // ---- steps 2a/2b: verb suffixes (only if step 1 removed nothing) --
    if (!step1Removed) {
      val y2a = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "yó")
      val removed2a = longest(s, y2a) match {
        case Some(suf) if inRV(suf.length) &&
            s.length > suf.length &&
            s.charAt(s.length - suf.length - 1) == 'u' =>
          del(suf.length); true
        case _ => false
      }
      if (!removed2a) {
        val gA = Seq("emos", "éis", "en", "es")
        val gB = Seq(
          "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
          "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
          "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
          "ásemos",
          "arían", "arías", "aréis", "erían", "erías", "eréis",
          "irían", "irías", "iréis", "ieran", "iesen", "ieron", "iendo",
          "ieras", "ieses", "abais", "arais", "aseis", "íamos",
          "arán", "arás", "aría", "erán", "erás", "ería", "irán",
          "irás", "iría", "iera", "iese", "aste", "iste", "aban",
          "aran", "asen", "aron", "ando", "abas", "adas", "idas",
          "aras", "ases", "íais", "ados", "idos", "amos", "imos",
          "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
          "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
          "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
          "ís")
        longest(s, gA ++ gB) match {
          case Some(suf) if gA.contains(suf) && inRV(suf.length) =>
            del(suf.length)
            if (s.endsWith("gu")) del(1) // llegues → llegu → lleg
          case Some(suf) if gB.contains(suf) && inRV(suf.length) =>
            del(suf.length)
          case _ => ()
        }
      }
    }

    // ---- step 3: residual suffix ----
    val res1 = Seq("os", "a", "o", "á", "í", "ó")
    val res2 = Seq("e", "é")
    longest(s, res1 ++ res2) match {
      case Some(suf) if res1.contains(suf) && inRV(suf.length) =>
        del(suf.length)
      case Some(suf) if res2.contains(suf) && inRV(suf.length) =>
        del(suf.length)
        // preceding gu with the u in RV → drop the u
        if (s.endsWith("gu") && s.length - 1 >= rv) del(1)
      case _ => ()
    }

    unAccent(s)
  }
}
