package graft.analysis

/** Hungarian stemmer, implemented from the published Snowball Hungarian
  * stemming algorithm (M.F. Porter's Snowball project; the reference
  * ships the Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/HungarianStemmer.cs:11).
  * Both the modern ő/ű codepoints and that generation's legacy õ/û
  * spellings are accepted as vowels/suffix forms.
  *
  * Outline (all steps R1-gated; single region R1):
  *  R1: word starts with a vowel → after the first consonant, where a
  *      consonant DIGRAPH (cs dzs gy ly ny sz ty zs) counts as one;
  *      starts with a consonant → after the first vowel.
  *  steps, in the reference's call order:
  *   1 instrum:      al/el after a double consonant → delete + undouble
  *   2 case:         the case-ending list (ban/ben, ból, ként, …) →
  *                   delete; then a remaining final á/é → a/e
  *   3 case_special: én→e, án→a, ánként→a
  *   4 case_other:   stul/stül→∅, astul/estül→∅, ástul→a, éstül→e
  *   5 factive:      á/é after a double consonant → delete + undouble
  *   6 owned:        é-possessives (é/ké/éi/éé families)
  *   7 sing_owner:   singular-owner suffixes (a/ja/d/nk/uk/m families)
  *   8 plur_owner:   plural-owner suffixes (i/id/ik/ink/itek families)
  *   9 plural:       k-plural (ák→a, ék→e, ok/ek/ak/ök/k→∅)
  *  "undouble" removes the second-to-last character, so doubled
  *  digraphs (ssz→sz, ggy→gy, ccs→cs) resolve correctly.
  */
object HungarianStemmer {

  private val Vowels = "aáeéiíoóöőuúüűõû".toSet
  private val Digraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val DoubleCons = Seq(
    "ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz")

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  private val CaseSufs: Seq[String] = Seq(
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
    "nál", "nél", "ból", "ról", "tól", "ből", "ről", "től",
    "bõl", "rõl", "tõl", "ül", "n", "an", "ban", "en",
    "ben", "képpen", "on", "ön", "képp", "kor", "t", "at", "et",
    "ként", "anként", "enként", "onként", "ot", "ért", "öt", "hez",
    "hoz", "höz", "vá", "vé")

  private val Owned: Seq[(String, String)] = Seq(
    "aké" -> "", "eké" -> "", "oké" -> "", "öké" -> "",
    "éké" -> "e", "áké" -> "a", "ké" -> "",
    "ééi" -> "e", "áéi" -> "a", "éi" -> "", "éé" -> "e", "é" -> "")

  private val SingOwner: Seq[(String, String)] = Seq(
    "a" -> "", "ja" -> "", "d" -> "", "ad" -> "", "ed" -> "",
    "od" -> "", "öd" -> "", "ád" -> "a", "éd" -> "e",
    "e" -> "", "je" -> "", "nk" -> "", "unk" -> "", "ánk" -> "a",
    "énk" -> "e", "ünk" -> "", "uk" -> "", "juk" -> "", "ájuk" -> "a",
    "ük" -> "", "jük" -> "", "éjük" -> "e",
    "m" -> "", "am" -> "", "em" -> "", "om" -> "", "ám" -> "a",
    "ém" -> "e", "o" -> "", "á" -> "a", "é" -> "e")

  private val PlurOwner: Seq[(String, String)] = Seq(
    "id" -> "", "aid" -> "", "jaid" -> "", "eid" -> "", "jeid" -> "",
    "áid" -> "a", "éid" -> "e",
    "i" -> "", "ai" -> "", "jai" -> "", "ei" -> "", "jei" -> "",
    "ái" -> "a", "éi" -> "e",
    "itek" -> "", "eitek" -> "", "jeitek" -> "", "éitek" -> "e",
    "ik" -> "", "aik" -> "", "jaik" -> "", "eik" -> "", "jeik" -> "",
    "áik" -> "a", "éik" -> "e",
    "ink" -> "", "aink" -> "", "jaink" -> "", "eink" -> "",
    "jeink" -> "", "áink" -> "a", "éink" -> "e",
    "aitok" -> "", "jaitok" -> "", "áitok" -> "a",
    "im" -> "", "aim" -> "", "jaim" -> "", "eim" -> "", "jeim" -> "",
    "áim" -> "a", "éim" -> "e")

  private val Plural: Seq[(String, String)] = Seq(
    "ák" -> "a", "ék" -> "e", "ök" -> "", "ak" -> "", "ok" -> "",
    "ek" -> "", "k" -> "")

  def stem(word: String): String = {
    if (word == null || word.length < 2)
      return if (word == null) "" else word.toLowerCase(java.util.Locale.ROOT)
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // ---- R1 (digraph-aware when the word starts with a vowel) ----
    val r1: Int =
      if (isVowel(s(0))) {
        var j = 0
        while (j < s.length && isVowel(s(j))) j += 1
        if (j >= s.length) s.length
        else Digraphs.find(d => s.startsWith(d, j)) match {
          case Some(d) => j + d.length
          case None => j + 1
        }
      } else {
        var j = 0
        while (j < s.length && !isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      }

    def start(suf: String) = s.length - suf.length
    def inR1(suf: String) = start(suf) >= r1
    def replace(suf: String, rep: String): Unit =
      s = s.substring(0, start(suf)) + rep
    def endsWithDoubleBefore(pos: Int): Boolean =
      DoubleCons.exists(d => pos >= d.length &&
        s.regionMatches(pos - d.length, d, 0, d.length))
    def undouble(): Unit =
      if (s.length >= 2)
        s = s.substring(0, s.length - 2) + s.substring(s.length - 1)

    // 1. instrum: al/el after a double consonant
    longest(s, Seq("al", "el")).foreach { suf =>
      if (inR1(suf) && endsWithDoubleBefore(start(suf))) {
        replace(suf, ""); undouble()
      }
    }

    // 2. case endings, then a remaining final á/é → a/e (R1)
    longest(s, CaseSufs).foreach { suf =>
      if (inR1(suf)) {
        replace(suf, "")
        if (s.nonEmpty && s.last == 'á' && s.length - 1 >= r1)
          s = s.dropRight(1) + "a"
        else if (s.nonEmpty && s.last == 'é' && s.length - 1 >= r1)
          s = s.dropRight(1) + "e"
      }
    }

    // 3. case_special
    longest(s, Seq("ánként", "án", "én")).foreach { suf =>
      if (inR1(suf))
        replace(suf, if (suf == "én") "e" else "a")
    }

    // 4. case_other
    longest(s, Seq("astul", "estül", "ástul", "éstül", "stul", "stül"))
      .foreach { suf =>
        if (inR1(suf)) suf match {
          case "ástul" => replace(suf, "a")
          case "éstül" => replace(suf, "e")
          case _ => replace(suf, "")
        }
      }

    // 5. factive: á/é after a double consonant
    longest(s, Seq("á", "é")).foreach { suf =>
      if (inR1(suf) && endsWithDoubleBefore(start(suf))) {
        replace(suf, ""); undouble()
      }
    }

    // 6-9. possessive/plural families, in the reference's call order
    Seq(Owned, SingOwner, PlurOwner, Plural).foreach { table =>
      longest(s, table.map(_._1)).foreach { suf =>
        if (inR1(suf)) replace(suf, table.toMap.apply(suf))
      }
    }

    s
  }
}
