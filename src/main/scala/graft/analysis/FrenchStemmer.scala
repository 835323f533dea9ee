package graft.analysis

/** French stemmer, implemented from the published Snowball French
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description; classic 2002 revision, matching the era of the
  * reference's contrib/Snowball wrapper, SnowballAnalyzer.cs:39). NOT a
  * port of the reference's FrenchStemmer
  * (/root/reference/src/contrib/Analyzers/Fr/FrenchStemmer.cs:34 is the
  * older Lucene buffer-oriented design).
  *
  * Outline:
  *  prelude. mark u/i between vowels, y next to a vowel, u after q as
  *           consonants (upper case).
  *  regions. RV (with the par/col/tap and two-leading-vowel special
  *           cases), R1, R2.
  *  step 1.  standard (mostly noun/adjective) suffix removal.
  *  step 2a. verb suffixes beginning i (only if step 1 removed nothing
  *           or removed one of amment/emment/ment/ments).
  *  step 2b. other verb suffixes (only if 2a ran and removed nothing).
  *  step 3.  final Y→i, ç→c (when the last applied step changed the
  *           word); otherwise step 4: residual s / ion / ier / e.
  *  steps 5/6. un-double final enn/onn/ett/ell/eill; un-accent é/è
  *           before a final non-vowel run. Unmark consonants.
  */
object FrenchStemmer {

  private val Vowels = "aeiouyâàëéêèïîôûù".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  /** Longest suffix of s drawn from `sufs` whose start is >= `limit`;
    * -1-length sentinel when none. Among semantics: the longest match
    * wins even if its side condition then fails (no retry). */
  private def longest(s: String, sufs: Seq[String], limit: Int = 0): Option[String] =
    sufs.filter(x => s.endsWith(x) && s.length - x.length >= limit)
      .sortBy(-_.length).headOption

  def stem(word: String): String = {
    if (word == null || word.length < 2) return if (word == null) "" else word
    var s = word.toLowerCase(java.util.Locale.ROOT)

    // ---- prelude: consonant-marking ----
    val a = s.toCharArray
    var i = 0
    while (i < a.length) {
      val prevV = i > 0 && isVowel(a(i - 1))
      val nextV = i < a.length - 1 && isVowel(a(i + 1))
      a(i) match {
        case 'u' if (prevV && nextV) || (i > 0 && a(i - 1) == 'q') =>
          a(i) = 'U'
        case 'i' if prevV && nextV => a(i) = 'I'
        case 'y' if prevV || nextV => a(i) = 'Y'
        case _ => ()
      }
      i += 1
    }
    s = new String(a)

    // ---- regions ----
    val rv =
      if (s.length >= 3 && isVowel(s(0)) && isVowel(s(1))) 3
      else if (s.startsWith("par") || s.startsWith("col") ||
        s.startsWith("tap")) 3
      else {
        var j = 1
        while (j < s.length && !isVowel(s(j))) j += 1
        if (j < s.length) j + 1 else s.length
      }
    val r1 = regionAfter(s, 0)
    val r2 = regionAfter(s, r1)

    def del(n: Int): Unit = s = s.substring(0, s.length - n)
    def repl(n: Int, by: String): Unit = s = s.substring(0, s.length - n) + by
    def pos(suf: String): Int = s.length - suf.length
    def inR2(suf: String): Boolean = pos(suf) >= r2
    def inR1(suf: String): Boolean = pos(suf) >= r1
    def inRV(suf: String): Boolean = pos(suf) >= rv

    // ---- step 1: standard suffix removal ----
    val mentSet = Set("amment", "emment", "ment", "ments")
    val step1Sufs = Seq(
      "issements", "issement", "atrices", "atrice", "ateurs", "ations",
      "logies", "usions", "utions", "amment", "emment", "ements",
      "ateur", "ation", "logie", "usion", "ution", "ences", "ement",
      "ables", "ismes", "istes", "iqUes", "ances", "ments", "euses",
      "ités", "ence", "able", "isme", "iste", "iqUe", "ance", "ment",
      "eaux", "euse", "ives", "ité", "eux", "aux", "ive", "ifs", "if")
    var step1Changed = false
    var foundMent = false
    longest(s, step1Sufs).foreach { suf =>
      val before = s
      suf match {
        case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
            "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
          if (inR2(suf)) del(suf.length)
        case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations" =>
          if (inR2(suf)) {
            del(suf.length)
            if (s.endsWith("ic")) {
              if (inR2("ic")) del(2) else repl(2, "iqU")
            }
          }
        case "logie" | "logies" =>
          if (inR2(suf)) repl(suf.length, "log")
        case "usion" | "ution" | "usions" | "utions" =>
          if (inR2(suf)) repl(suf.length, "u")
        case "ence" | "ences" =>
          if (inR2(suf)) repl(suf.length, "ent")
        case "ement" | "ements" =>
          if (inRV(suf)) {
            del(suf.length)
            if (s.endsWith("iv") && inR2("iv")) {
              del(2)
              if (s.endsWith("at") && inR2("at")) del(2)
            } else if (s.endsWith("eus")) {
              if (inR2("eus")) del(3)
              else if (inR1("eus")) repl(3, "eux")
            } else if (s.endsWith("abl") && inR2("abl")) del(3)
            else if (s.endsWith("iqU") && inR2("iqU")) del(3)
            else if (s.endsWith("ièr") && inRV("ièr")) repl(3, "i")
            else if (s.endsWith("Ièr") && inRV("Ièr")) repl(3, "i")
          }
        case "ité" | "ités" =>
          if (inR2(suf)) {
            del(suf.length)
            if (s.endsWith("abil")) {
              if (inR2("abil")) del(4) else repl(4, "abl")
            } else if (s.endsWith("ic")) {
              if (inR2("ic")) del(2) else repl(2, "iqU")
            } else if (s.endsWith("iv") && inR2("iv")) del(2)
          }
        case "if" | "ive" | "ifs" | "ives" =>
          if (inR2(suf)) {
            del(suf.length)
            if (s.endsWith("at") && inR2("at")) {
              del(2)
              if (s.endsWith("ic")) {
                if (inR2("ic")) del(2) else repl(2, "iqU")
              }
            }
          }
        case "eaux" => repl(4, "eau")
        case "aux" => if (inR1(suf)) repl(3, "al")
        case "euse" | "euses" =>
          if (inR2(suf)) del(suf.length)
          else if (inR1(suf)) repl(suf.length, "eux")
        case "issement" | "issements" =>
          if (inR1(suf) && pos(suf) > 0 && !isVowel(s(pos(suf) - 1)))
            del(suf.length)
        case "amment" => if (inRV(suf)) repl(suf.length, "ant")
        case "emment" => if (inRV(suf)) repl(suf.length, "ent")
        case "ment" | "ments" =>
          val p = pos(suf)
          if (p > 0 && isVowel(s(p - 1)) && p - 1 >= rv) del(suf.length)
      }
      step1Changed = s != before
      foundMent = mentSet(suf)
    }

    // ---- steps 2a/2b: verb suffixes (all matching confined to RV) ----
    val do2a = !step1Changed || foundMent
    var did2a = false
    var changed2a = false
    var changed2b = false
    if (do2a) {
      did2a = true
      val sufs2a = Seq(
        "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
        "irions", "issais", "issait", "issant", "issent", "issiez",
        "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
        "isses", "issez", "îmes", "îtes", "irai", "iras", "irez",
        "isse", "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
      longest(s, sufs2a, rv).foreach { suf =>
        val p = pos(suf)
        if (p > 0 && p - 1 >= rv && !isVowel(s(p - 1))) {
          del(suf.length)
          changed2a = true
        }
      }
      if (!changed2a) {
        // step 2b
        val g2 = Set("é", "ée", "ées", "és", "èrent", "er", "era", "erai",
          "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
          "erons", "eront", "ez", "iez")
        val g3 = Set("âmes", "ât", "âtes", "a", "ai", "aIent", "ais",
          "ait", "ant", "ante", "antes", "ants", "as", "asse", "assent",
          "asses", "assiez", "assions")
        val all2b = (g2 ++ g3 + "ions").toSeq
        longest(s, all2b, rv).foreach { suf =>
          if (suf == "ions") {
            if (inR2(suf)) { del(4); changed2b = true }
          } else if (g2(suf)) {
            del(suf.length); changed2b = true
          } else {
            del(suf.length); changed2b = true
            if (s.endsWith("e") && s.length - 1 >= rv) del(1)
          }
        }
      }
    }

    val lastAltered =
      if (did2a && !changed2a) changed2b
      else if (did2a) changed2a
      else step1Changed

    if (lastAltered) {
      // ---- step 3 ----
      if (s.endsWith("Y")) repl(1, "i")
      else if (s.endsWith("ç")) repl(1, "c")
    } else {
      // ---- step 4: residual suffix ----
      if (s.length > 1 && s.endsWith("s") &&
          !"aiouès".contains(s(s.length - 2)))
        del(1)
      val sufs4 = Seq("Ière", "ière", "Ier", "ier", "ion", "ë", "e")
      longest(s, sufs4, rv).foreach {
        case "ion" =>
          val p = pos("ion")
          if (p >= r2 && p > 0 && p - 1 >= rv &&
              (s(p - 1) == 's' || s(p - 1) == 't'))
            del(3)
        case suf @ ("ier" | "ière" | "Ier" | "Ière") => repl(suf.length, "i")
        case "e" => del(1)
        case "ë" => if (s.endsWith("guë")) del(1)
      }
    }

    // ---- step 5: un-double ----
    if (s.endsWith("enn") || s.endsWith("onn") || s.endsWith("ett") ||
        s.endsWith("ell") || s.endsWith("eill"))
      del(1)

    // ---- step 6: un-accent (é/è before a final non-vowel run) ----
    var j = s.length - 1
    var nonV = 0
    while (j >= 0 && !isVowel(s(j))) { j -= 1; nonV += 1 }
    if (nonV >= 1 && j >= 0 && (s(j) == 'é' || s(j) == 'è'))
      s = s.substring(0, j) + 'e' + s.substring(j + 1)

    // ---- postlude: unmark consonants ----
    s.map {
      case 'U' => 'u'
      case 'I' => 'i'
      case 'Y' => 'y'
      case c => c
    }
  }
}
