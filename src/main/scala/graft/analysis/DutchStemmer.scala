package graft.analysis

/** Dutch stemmer, implemented from the published Snowball Dutch
  * stemming algorithm (M.F. Porter's Snowball project, public algorithm
  * description). The reference ships the Snowball-generated equivalent
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/DutchStemmer.cs:11)
  * wrapped by SnowballAnalyzer.cs:39.
  *
  * Outline:
  *  prelude. fold umlauted/acuted vowels to plain; mark consonantal
  *           uses of i/y as uppercase I/Y (initial y, y after a vowel,
  *           i between vowels) so the region scan treats them as
  *           consonants.
  *  regions. R1/R2 via the standard two-scan rule (R2 continues from
  *           the UNADJUSTED R1 cursor); R1 start is then floored at 3.
  *  step 1.  longest of heden→heid, en/ene (after a valid en-ending:
  *           non-vowel, not gem; then undouble kk/dd/tt), s/se (after
  *           a non-vowel other than j) — condition failure on the
  *           longest match ends the step (no shorter retry).
  *  step 2.  final e after a non-vowel in R1 → delete + undouble
  *           (remember e_found for 3b's bar).
  *  step 3a. heid in R2 not after c → delete, then the 1(b) en rule.
  *  step 3b. longest of end/ing (then ig-not-after-e in R2, else
  *           undouble), ig not after e, lijk (then repeat step 2),
  *           baar, bar (only if step 2 removed an e) — all in R2.
  *  step 4.  undouble vowel: ...C aa|ee|oo|uu D (D a non-vowel other
  *           than I) loses one vowel.
  *  postlude. lower the I/Y marks back.
  */
object DutchStemmer {

  /** Vowel set AFTER the prelude (uppercase marks are consonants). */
  private val Vowels = "aeiouyè".toSet

  @inline private def isVowel(c: Char): Boolean = Vowels(c)

  private val AccentFold = Map(
    'ä' -> 'a', 'á' -> 'a', 'ë' -> 'e', 'é' -> 'e', 'ï' -> 'i',
    'í' -> 'i', 'ö' -> 'o', 'ó' -> 'o', 'ü' -> 'u', 'ú' -> 'u')

  def stem(word: String): String = {
    if (word == null) return ""
    val lower = word.toLowerCase(java.util.Locale.ROOT)
      .map(c => AccentFold.getOrElse(c, c))
    if (lower.length < 2) return lower

    // ---- prelude: consonant-mark i/y (left context is the already
    // marked text, right context the raw fold) ----
    val marked = new StringBuilder(lower)
    var i = 0
    while (i < marked.length) {
      val c = marked(i)
      if (c == 'y' && (i == 0 || isVowel(marked(i - 1)))) marked(i) = 'Y'
      else if (c == 'i' && i > 0 && i < marked.length - 1 &&
        isVowel(marked(i - 1)) && isVowel(lower(i + 1))) marked(i) = 'I'
      i += 1
    }
    var s = marked.toString

    // ---- regions ----
    val (r1, r2) = {
      var j = 0
      while (j < s.length && !isVowel(s(j))) j += 1
      while (j < s.length && isVowel(s(j))) j += 1
      val p1raw = if (j < s.length) j + 1 else s.length
      j = p1raw
      while (j < s.length && !isVowel(s(j))) j += 1
      while (j < s.length && isVowel(s(j))) j += 1
      val p2 = if (j < s.length) j + 1 else s.length
      (math.max(p1raw, 3), p2)
    }
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2
    def del(n: Int): Unit = s = s.substring(0, s.length - n)
    def undouble(): Unit =
      if (Seq("kk", "dd", "tt").exists(s.endsWith)) del(1)
    def validEn(suffixLen: Int): Boolean = {
      val pre = s.substring(0, s.length - suffixLen)
      pre.nonEmpty && !isVowel(pre.last) && !pre.endsWith("gem")
    }

    // ---- step 1 (longest match; a failed condition ends the step) ----
    Seq("heden", "ene", "en", "se", "s")
      .filter(p => s.endsWith(p) && inR1(p.length))
      .sortBy(-_.length).headOption.foreach {
        case "heden" => s = s.substring(0, s.length - 5) + "heid"
        case p @ ("ene" | "en") =>
          if (validEn(p.length)) { del(p.length); undouble() }
        case p @ ("se" | "s") =>
          val c = s(s.length - p.length - 1)
          if (!isVowel(c) && c != 'j') del(p.length)
        case _ => ()
      }

    // ---- step 2 ----
    var eFound = false
    if (s.endsWith("e") && inR1(1) && s.length >= 2 &&
      !isVowel(s(s.length - 2))) {
      del(1); eFound = true; undouble()
    }

    // ---- step 3a ----
    if (s.endsWith("heid") && inR2(4) && s.length >= 5 &&
      s(s.length - 5) != 'c') {
      del(4)
      if (s.endsWith("en") && inR1(2) && validEn(2)) { del(2); undouble() }
    }

    // ---- step 3b ----
    Seq("lijk", "baar", "end", "ing", "bar", "ig")
      .filter(p => s.endsWith(p) && inR2(p.length))
      .sortBy(-_.length).headOption.foreach {
        case p @ ("end" | "ing") =>
          del(p.length)
          if (s.endsWith("ig") && inR2(2) && s.length >= 3 &&
            s(s.length - 3) != 'e') del(2)
          else undouble()
        case "ig" => if (s.length >= 3 && s(s.length - 3) != 'e') del(2)
        case "lijk" =>
          del(4)
          if (s.endsWith("e") && inR1(1) && s.length >= 2 &&
            !isVowel(s(s.length - 2))) { del(1); undouble() }
        case "baar" => del(4)
        case "bar" => if (eFound) del(3)
        case _ => ()
      }

    // ---- step 4: undouble vowel ----
    if (s.length >= 4) {
      val d = s(s.length - 1)
      val v2 = s(s.length - 2); val v1 = s(s.length - 3)
      val c = s(s.length - 4)
      if (!isVowel(d) && d != 'I' && v1 == v2 && "aeou".contains(v1) &&
        !isVowel(c))
        s = s.substring(0, s.length - 2) + d
    }

    // ---- postlude ----
    s.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }
}
