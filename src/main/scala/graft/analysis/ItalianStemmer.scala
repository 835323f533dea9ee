package graft.analysis

/** Italian stemmer, implemented from the published Snowball Italian
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/ItalianStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39 — same published algorithm,
  * re-implemented directly.
  *
  * Outline:
  *  prelude. acute → grave accents; u after q and u/i between vowels
  *           marked as consonants (upper case).
  *  regions. R1/R2 standard; RV with the Spanish/Italian three-way rule.
  *  step 0.  attached pronoun after gerund (delete) or infinitive
  *           (replace pronoun with e): mangiarlo → mangiare.
  *  step 1.  standard suffixes (ico/abile/oso/mente…, azione (+ic),
  *           logia→log, uzione→u, enza→ente, amento in RV, amente with
  *           the iv/at and os/ic/abil side chains, ità (+abil/ic/iv),
  *           ivo (+at (+ic))).
  *  step 2.  verb suffixes in RV (only if step 1 removed nothing).
  *  step 3a. final vowel (then a preceding i) in RV; 3b. ch→c / gh→g.
  *  postlude. unmark consonants, i.e. U/I/Y → lower case.
  */
object ItalianStemmer {

  private val Vowels = "aeiouàèìòù".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)
      .map {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      }

    // ---- prelude: consonant-marking ----
    locally {
      val a = s.toCharArray
      var i = 0
      while (i < a.length) {
        val prevV = i > 0 && isVowel(a(i - 1))
        val nextV = i < a.length - 1 && isVowel(a(i + 1))
        a(i) match {
          case 'u' if (prevV && nextV) || (i > 0 && a(i - 1) == 'q') =>
            a(i) = 'U'
          case 'i' if prevV && nextV => a(i) = 'I'
          case _ => ()
        }
        i += 1
      }
      s = new String(a)
    }

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

    // ---- step 0: attached pronoun ----
    val pronouns = Seq("gliela", "gliele", "glieli", "glielo", "gliene",
      "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
      "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
      "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
      "li", "lo", "mi", "ne", "si", "ti", "vi")
    longest(s, pronouns).foreach { p =>
      val stemPart = s.substring(0, s.length - p.length)
      longest(stemPart, Seq("ando", "endo")) match {
        case Some(g) if stemPart.length - g.length >= rv => s = stemPart
        case _ =>
          longest(stemPart, Seq("ar", "er", "ir")) match {
            case Some(g) if stemPart.length - g.length >= rv =>
              s = stemPart + "e" // replacement by e (infinitive restore)
            case _ => ()
          }
      }
    }

    // ---- step 1: standard suffixes ----
    val g1 = Seq("atrice", "atrici", "abile", "abili", "ibile", "ibili",
      "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista",
      "iste", "isti", "istà", "istè", "istì", "ante", "anti", "ico",
      "ici", "ica", "ice", "oso", "osi", "osa", "ose")
    val g2 = Seq("azione", "azioni", "atore", "atori")
    val g3 = Seq("logia", "logie")
    val g4 = Seq("uzione", "uzioni", "usione", "usioni")
    val g5 = Seq("enza", "enze")
    val gAmento = Seq("amento", "amenti", "imento", "imenti")
    val g6 = Seq("amente")
    val g7 = Seq("ità")
    val g8 = Seq("ivo", "ivi", "iva", "ive")
    val all = g1 ++ g2 ++ g3 ++ g4 ++ g5 ++ gAmento ++ g6 ++ g7 ++ g8
    var step1Removed = false
    longest(s, all).foreach { suf =>
      val n = suf.length
      def strip(extra: Seq[String]): Unit =
        longest(s, extra).filter(e => inR2(e.length)).foreach(e =>
          del(e.length))
      if (g6.contains(suf)) {
        if (inR1(n)) {
          del(n); step1Removed = true
          if (s.endsWith("iv") && inR2(2)) {
            del(2)
            if (s.endsWith("at") && inR2(2)) del(2)
          } else strip(Seq("abil", "os", "ic"))
        }
      } else if (gAmento.contains(suf)) {
        if (inRV(n)) { del(n); step1Removed = true }
      } else if (inR2(n)) {
        del(n); step1Removed = true
        if (g2.contains(suf)) strip(Seq("ic"))
        else if (g3.contains(suf)) s = s + "log"
        else if (g4.contains(suf)) s = s + "u"
        else if (g5.contains(suf)) s = s + "ente"
        else if (g7.contains(suf)) strip(Seq("abil", "ic", "iv"))
        else if (g8.contains(suf)) {
          if (s.endsWith("at") && inR2(2)) {
            del(2)
            if (s.endsWith("ic") && inR2(2)) del(2)
          }
        }
      }
    }

    // ---- step 2: verb suffixes (only if step 1 removed nothing) ----
    if (!step1Removed) {
      val verbs = Seq(
        "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
        "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
        "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
        "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
        "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
        "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo",
        "enda", "ende", "endi", "endo", "erai", "erei", "Iamo", "iamo",
        "immo", "irai", "irei", "isca", "isce", "isci", "isco", "ano",
        "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà",
        "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò",
        "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
        "ute", "uti", "uto", "ar", "ir")
      longest(s, verbs).foreach { suf =>
        if (inRV(suf.length)) del(suf.length)
      }
    }

    // ---- step 3a: final vowel, then a preceding i, in RV ----
    val finals = Seq("a", "e", "i", "o", "à", "è", "ì", "ò")
    longest(s, finals).foreach { suf =>
      if (inRV(1)) {
        del(1)
        if (s.endsWith("i") && inRV(1)) del(1)
      }
    }
    // ---- step 3b: ch → c, gh → g in RV ----
    if ((s.endsWith("ch") || s.endsWith("gh")) && inRV(2)) del(1)

    // ---- postlude: unmark ----
    s.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }
}
