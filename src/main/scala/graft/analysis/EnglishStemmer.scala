package graft.analysis

/** English stemmer ("Porter2"), implemented from the published Snowball
  * English stemming algorithm (M.F. Porter, snowball project; the
  * revision the reference generated its code from — the reference ships
  * the Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/EnglishStemmer.cs:11).
  * Variant pins, verified against that generation: R1 exception list is
  * `gener` only (no commun/arsen), no apostrophe step 0, initial y is
  * marked only when followed by a vowel, and `shortv` is
  * (non-vWXY ← v ← non-v) or (non-v ← v ← word start).
  *
  * Outline:
  *  prelude: y after a vowel (and initial y before a vowel) → Y, so
  *           marked y's are consonants for the region/vowel tests.
  *  R1/R2:   standard regions; `gener`-prefixed words start R1 at 5.
  *  step 0:  whole-word exception lists (skis→ski … sky→sky).
  *  step 1a: sses→ss; ied/ies→i|ie; s-deletion with the
  *           vowel-not-immediately-before gate; then the post-1a
  *           whole-word stop list (inning … succeed).
  *  step 1b: eed(ly)→ee in R1; ed/edly/ing/ingly deleted after a vowel,
  *           then at/bl/iz → +e, undouble, or short-word → +e.
  *  step 1c: final y/Y → i after a non-initial non-vowel.
  *  steps 2-4: suffix mapping tables gated on R1/R2 (longest match
  *           decides, conditions never fall back to shorter matches).
  *  step 5:  final e/l cleanup; postlude unmarks Y.
  */
object EnglishStemmer {

  private val Vowels = "aeiouy".toSet
  /** The shortv "non-vowel other than w, x or Y" complement set. */
  private val VWXY = Vowels ++ Set('w', 'x', 'Y')
  private val ValidLi = "cdeghkmnrt".toSet
  private val Doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  private val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
    "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
    "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
    "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe",
    "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes")

  private val Exception2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")

  private val Step2: Seq[(String, Option[String])] = Seq(
    // (suffix, replacement); None = conditional handled separately
    "ization" -> Some("ize"), "ational" -> Some("ate"),
    "fulness" -> Some("ful"), "ousness" -> Some("ous"),
    "iveness" -> Some("ive"), "tional" -> Some("tion"),
    "biliti" -> Some("ble"), "lessli" -> Some("less"),
    "entli" -> Some("ent"), "ation" -> Some("ate"),
    "alism" -> Some("al"), "aliti" -> Some("al"),
    "ousli" -> Some("ous"), "iviti" -> Some("ive"),
    "fulli" -> Some("ful"), "enci" -> Some("ence"),
    "anci" -> Some("ance"), "abli" -> Some("able"),
    "izer" -> Some("ize"), "ator" -> Some("ate"),
    "alli" -> Some("al"), "bli" -> Some("ble"),
    "ogi" -> None, "li" -> None)

  private val Step3: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
    "ful" -> "", "ness" -> "")

  private val Step4: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

  def stem(word: String): String = {
    if (word == null) return ""
    val lower = word.toLowerCase(java.util.Locale.ROOT)
    if (lower.length < 3) return lower
    Exception1.get(lower) match {
      case Some(st) => return st
      case None => ()
    }

    // ---- prelude: mark consonant-y as Y ----
    val buf = lower.toCharArray
    if (buf(0) == 'y' && buf.length > 1 && Vowels(buf(1))) buf(0) = 'Y'
    var i = 1
    while (i < buf.length) {
      if (buf(i) == 'y' && Vowels(buf(i - 1))) buf(i) = 'Y'
      i += 1
    }
    var s = new String(buf)

    def isV(c: Char) = Vowels(c)

    // ---- R1/R2 (gener exception) ----
    // gopast v; gopast non-v; returns the position AFTER, or -1
    def gopast(from: Int, want: Char => Boolean): Int = {
      var j = from
      while (j < s.length && !want(s(j))) j += 1
      if (j < s.length) j + 1 else -1
    }
    var p1 = s.length
    var p2 = s.length
    locally {
      val c1 =
        if (s.startsWith("gener")) 5
        else {
          val a = gopast(0, isV)
          if (a < 0) -1 else gopast(a, c => !isV(c))
        }
      if (c1 >= 0) {
        p1 = c1
        val a2 = gopast(c1, isV)
        if (a2 >= 0) {
          val b2 = gopast(a2, c => !isV(c))
          if (b2 >= 0) p2 = b2
        }
      }
    }

    def inR1(suffixLen: Int) = s.length - suffixLen >= p1
    def inR2(suffixLen: Int) = s.length - suffixLen >= p2

    /** shortv tested with the cursor at `pos` (backward mode). */
    def shortvAt(pos: Int): Boolean =
      (pos >= 3 && !VWXY(s(pos - 1)) && isV(s(pos - 2)) && !isV(s(pos - 3))) ||
        (pos == 2 && !isV(s(1)) && isV(s(0)))

    // ---- step 1a ----
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ied") || s.endsWith("ies")) {
      val prefix = s.dropRight(3)
      s = prefix + (if (prefix.length > 1) "i" else "ie")
    } else if (s.endsWith("ss") || s.endsWith("us")) ()
    else if (s.endsWith("s")) {
      // delete if a vowel exists before the char immediately preceding s
      if ((0 until s.length - 2).exists(j => isV(s(j)))) s = s.dropRight(1)
    }

    if (Exception2.contains(s)) return s // postlude is a no-op for these

    // ---- step 1b ----
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
      .find(s.endsWith)
    s1b.foreach {
      case suf @ ("eed" | "eedly") =>
        if (inR1(suf.length)) s = s.dropRight(suf.length) + "ee"
      case suf =>
        val prefix = s.dropRight(suf.length)
        if (prefix.exists(isV)) {
          s = prefix
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz"))
            s = s + "e"
          else if (s.length >= 2 && Doubles(s.takeRight(2)))
            s = s.dropRight(1)
          else if (p1 == s.length && shortvAt(s.length)) s = s + "e"
        }
    }

    // ---- step 1c ----
    if (s.length >= 3 && (s.last == 'y' || s.last == 'Y') &&
      !isV(s(s.length - 2)))
      s = s.dropRight(1) + "i"

    // ---- step 2 (R1) ----
    Step2.find { case (suf, _) => s.endsWith(suf) }.foreach {
      case (suf, rep) =>
        if (inR1(suf.length)) rep match {
          case Some(r) => s = s.dropRight(suf.length) + r
          case None if suf == "ogi" =>
            if (s.length > 3 && s(s.length - 4) == 'l')
              s = s.dropRight(3) + "og"
          case None => // li
            if (s.length > 2 && ValidLi(s(s.length - 3)))
              s = s.dropRight(2)
        }
    }

    // ---- step 3 (R1; ative needs R2) ----
    Step3.find { case (suf, _) => s.endsWith(suf) }.foreach {
      case (suf, rep) =>
        if (inR1(suf.length) && (suf != "ative" || inR2(suf.length)))
          s = s.dropRight(suf.length) + rep
    }

    // ---- step 4 (R2) ----
    Step4.find(s.endsWith).foreach { suf =>
      if (inR2(suf.length) &&
        (suf != "ion" || (s.length > 3 &&
          (s(s.length - 4) == 's' || s(s.length - 4) == 't'))))
        s = s.dropRight(suf.length)
    }

    // ---- step 5 ----
    if (s.nonEmpty && s.last == 'e' &&
      (inR2(1) || (inR1(1) && !shortvAt(s.length - 1))))
      s = s.dropRight(1)
    else if (s.nonEmpty && s.last == 'l' && inR2(1) &&
      s.length >= 2 && s(s.length - 2) == 'l')
      s = s.dropRight(1)

    // ---- postlude ----
    s.replace('Y', 'y')
  }
}
