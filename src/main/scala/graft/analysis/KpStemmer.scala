package graft.analysis

/** Kraaij–Pohlmann Dutch stemmer ("kp"), implemented from the published
  * Snowball kraaij_pohlmann algorithm (W. Kraaij & R. Pohlmann's Dutch
  * stemmer as realized in M.F. Porter's Snowball project; the reference
  * ships the Snowball-compiler output at
  * /root/reference/src/contrib/Snowball/SF/Snowball/Ext/KpStemmer.cs:11).
  *
  * Distinctives vs the standard Dutch algorithm:
  *  - `ij` counts as ONE vowel unit in the R1/R2 measure;
  *  - vowel LENGTHENING on deletion (lengthen_V): when the stem ends
  *    consonant (not w/x) after a single a/o/u — or a gated e — the
  *    vowel doubles back (hopen→hop→hoop, nemen→nem→neem);
  *  - ge- PREFIX and -ge- INFIX removal with re-measured regions, each
  *    followed by a d/t cleanup (Step 1c) only when ge was removed;
  *  - final-consonant normalization: kt→k ft→f pt→p (Step 7), then —
  *    only if anything stemmed — undoubling plus final v→f, z→s
  *    (Step 6).
  * Steps 1-4 strip plural/diminutive (-en/-s/-'s/-tje/-pje…),
  * adjectival (-de/-te/-se/-lijke…), nominal (-heid/-ing/-atie→eer…)
  * and derivational (-baar/-achtig/-erig/-ig…) suffixes under R1/R2
  * and the V/VX/C context tests.
  */
object KpStemmer {

  private val V = "aeiouy".toSet
  private val VWX = "aeiouywx".toSet
  private val AOU = "aou".toSet
  private val AIOU = "aiou".toSet

  @inline private def isV(c: Char): Boolean = V(c)

  /** R1/R2 marks with the ij-as-one-vowel measure. */
  private def measure(s: String): (Int, Int) = {
    var p1 = s.length
    var p2 = s.length
    var i = 0
    def vUnit(j: Int): Int =
      if (s.startsWith("ij", j)) 2
      else if (j < s.length && isV(s(j))) 1
      else 0
    def group(): Boolean = {
      while (i < s.length && !isV(s(i))) i += 1
      var cnt = 0
      var a = vUnit(i)
      while (a > 0) { i += a; cnt += 1; a = vUnit(i) }
      cnt >= 1 && i < s.length && !isV(s(i)) && { i += 1; true }
    }
    if (group()) {
      p1 = i
      if (group()) p2 = i
    }
    (p1, p2)
  }

  /** test V at backward position p: vowel or ij just before p. */
  private def tV(s: String, p: Int): Boolean =
    (p >= 1 && isV(s(p - 1))) || (p >= 2 && s.startsWith("ij", p - 2))
  /** test VX: V one position further back. */
  private def tVX(s: String, p: Int): Boolean = p >= 1 && tV(s, p - 1)
  /** test C: not ij, and a non-vowel just before p. */
  private def tC(s: String, p: Int): Boolean =
    p >= 1 && !(p >= 2 && s.startsWith("ij", p - 2)) && !isV(s(p - 1))

  /** lengthen_V at the stem end: double a single a/o/u (or gated e)
    * sitting before a final non-v/w/x consonant. */
  private def lengthenV(s: String): String = {
    val n = s.length
    if (n < 2 || VWX(s(n - 1))) return s
    val vpos = n - 2
    val ch = s(vpos)
    val beforeOk = vpos == 0 || !isV(s(vpos - 1))
    if (AOU(ch)) {
      if (beforeOk) s.substring(0, vpos) + ch + s.substring(vpos) else s
    } else if (ch == 'e') {
      val notAiou = !(vpos >= 1 && AIOU(s(vpos - 1)))
      // blocked when skipping one char lands on AIOU over a non-vowel
      val nextBlock = vpos >= 3 && AIOU(s(vpos - 2)) && !isV(s(vpos - 3))
      if (beforeOk && notAiou && !nextBlock)
        s.substring(0, vpos) + "e" + s.substring(vpos)
      else s
    } else s
  }

  private def longest(s: String, sufs: Seq[String]): Option[String] =
    sufs.filter(s.endsWith).sortBy(-_.length).headOption

  def stem(word: String): String = {
    if (word == null || word.isEmpty) return ""
    var s = word.toLowerCase(java.util.Locale.ROOT)
    var yFound = false
    var stemmed = false

    // ---- prelude: mark consonant-y ----
    locally {
      val b = s.toCharArray
      if (b(0) == 'y') { b(0) = 'Y'; yFound = true }
      var i = 1
      while (i < b.length) {
        if (b(i) == 'y' && isV(b(i - 1))) { b(i) = 'Y'; yFound = true }
        i += 1
      }
      s = new String(b)
    }

    var (p1, p2) = measure(s)
    def r1(p: Int) = p >= p1
    def r2(p: Int) = p >= p2

    // ---- Step 1: plural / possessive endings ----
    def step1(): Boolean = {
      val n = s.length
      longest(s, Seq("nde", "ies", "aus", "'s", "es", "en", "s")) match {
        case Some("'s") => s = s.dropRight(2); true
        case Some("s") =>
          val p = n - 1
          if (r1(p) && !(p >= 1 && s(p - 1) == 't' && r1(p - 1)) && tC(s, p)) {
            s = s.dropRight(1); true
          } else false
        case Some("ies") =>
          if (r1(n - 3)) { s = s.dropRight(3) + "ie"; true } else false
        case Some("es") =>
          if (s.endsWith("ares") && r1(n - 4) && tC(s, n - 4)) {
            s = lengthenV(s.dropRight(4)); true
          } else if (s.endsWith("eres") && r1(n - 4) && tC(s, n - 4)) {
            s = s.dropRight(4); true
          } else if (r1(n - 2) && tC(s, n - 2)) {
            s = s.dropRight(2) + "e"; true
          } else false
        case Some("aus") =>
          if (r1(n - 3) && tV(s, n - 3)) { s = s.dropRight(3) + "au"; true }
          else false
        case Some("en") =>
          val p = n - 2
          if (s.endsWith("heden") && r1(n - 5)) {
            s = s.dropRight(5) + "heid"; true
          } else if (s.endsWith("nden")) { s = s.dropRight(2); true }
          else if (s.endsWith("den") && r1(n - 3) && tC(s, n - 3)) {
            s = s.dropRight(3); true
          } else if (p >= 1 && (s(p - 1) == 'i' || s(p - 1) == 'j') &&
            tV(s, p - 1)) { s = s.dropRight(2); true }
          else if (r1(p) && tC(s, p)) {
            s = lengthenV(s.dropRight(2)); true
          } else false
        case Some("nde") => s = s.dropRight(1); true // nde → nd
        case _ => false
      }
    }

    // ---- Step 2: -e endings (diminutives, adjectival -de/-te/…) ----
    def step2(): Boolean = {
      val n = s.length
      longest(s, Seq("ische", "lijke", "ieve", "ene", "de", "ge", "je",
        "le", "re", "se", "te")) match {
        case Some("je") =>
          val p = n - 2
          if (s.endsWith("'tje")) { s = s.dropRight(4); true }
          else if (s.endsWith("etje") && r1(n - 4) && tC(s, n - 4)) {
            s = s.dropRight(4); true
          } else if (s.endsWith("rntje")) { s = s.dropRight(5) + "rn"; true }
          else if (s.endsWith("tje") && r1(n - 3) && tVX(s, n - 3)) {
            s = s.dropRight(3); true
          } else if (s.endsWith("inkje")) { s = s.dropRight(5) + "ing"; true }
          else if (s.endsWith("mpje")) { s = s.dropRight(4) + "m"; true }
          else if (s.endsWith("'je") && r1(n - 3)) { s = s.dropRight(3); true }
          else if (r1(p) && tC(s, p)) { s = s.dropRight(2); true }
          else false
        case Some("ge") =>
          if (r1(n - 2)) { s = s.dropRight(1); true } else false
        case Some("lijke") =>
          if (r1(n - 5)) { s = s.dropRight(1); true } else false
        case Some("ische") =>
          if (r1(n - 5)) { s = s.dropRight(1); true } else false
        case Some("de") =>
          if (r1(n - 2) && tC(s, n - 2)) { s = s.dropRight(2); true }
          else false
        case Some("te") =>
          if (r1(n - 2)) { s = s.dropRight(1); true } else false
        case Some("se") =>
          if (r1(n - 2)) { s = s.dropRight(1); true } else false
        case Some("re") =>
          if (r1(n - 2)) { s = s.dropRight(1); true } else false
        case Some("le") =>
          if (r1(n - 2)) { s = lengthenV(s.dropRight(2)); true } else false
        case Some("ene") =>
          if (r1(n - 3) && tC(s, n - 3)) {
            s = lengthenV(s.dropRight(3)); true
          } else false
        case Some("ieve") =>
          if (r1(n - 4) && tC(s, n - 4)) { s = s.dropRight(4) + "ief"; true }
          else false
        case _ => false
      }
    }

    // ---- Step 3: nominal suffixes ----
    def step3(): Boolean = {
      val n = s.length
      longest(s, Seq("iteit", "heid", "atie", "arij", "erij", "isme",
        "rder", "ster", "fie", "gie", "ing", "sel", "dst", "tst")) match {
        case Some("atie") =>
          if (r1(n - 4)) { s = s.dropRight(4) + "eer"; true } else false
        case Some("iteit") =>
          if (r1(n - 5)) { s = lengthenV(s.dropRight(5)); true } else false
        case Some(x @ ("heid" | "sel" | "ster")) =>
          if (r1(n - x.length)) { s = s.dropRight(x.length); true } else false
        case Some("rder") => s = s.dropRight(3); true // rder → r
        case Some(x @ ("isme" | "ing" | "erij")) =>
          if (r1(n - x.length)) {
            s = lengthenV(s.dropRight(x.length)); true
          } else false
        case Some("arij") =>
          if (r1(n - 4) && tC(s, n - 4)) { s = s.dropRight(4) + "aar"; true }
          else false
        case Some(x @ ("fie" | "gie")) =>
          if (r2(n - 3)) { s = lengthenV(s.dropRight(3)); true } else false
        case Some(x @ ("tst" | "dst")) =>
          if (r1(n - 3) && tC(s, n - 3)) { s = s.dropRight(2); true }
          else false
        case _ => false
      }
    }

    // ---- Step 4: derivational suffixes ----
    def step4(): Boolean = {
      val n = s.length
      val first = longest(s, Seq("achtiger", "achtigst", "eriger",
        "erigst", "lijker", "lijkst", "ioneel", "achtig", "atief",
        "baar", "laar", "naar", "raar", "tant", "erig", "end")) match {
        case Some("ioneel") =>
          if (r1(n - 6)) { s = s.dropRight(6) + "ie"; true } else false
        case Some("atief") =>
          if (r1(n - 5)) { s = s.dropRight(5) + "eer"; true } else false
        case Some("baar") =>
          if (r1(n - 4)) { s = s.dropRight(4); true } else false
        case Some("naar") =>
          if (r1(n - 4) && tV(s, n - 4)) { s = s.dropRight(4) + "n"; true }
          else false
        case Some("laar") =>
          if (r1(n - 4) && tV(s, n - 4)) { s = s.dropRight(4) + "l"; true }
          else false
        case Some("raar") =>
          if (r1(n - 4) && tV(s, n - 4)) { s = s.dropRight(4) + "r"; true }
          else false
        case Some("tant") =>
          if (r1(n - 4)) { s = s.dropRight(4) + "teer"; true } else false
        case Some(x @ ("lijker" | "lijkst")) =>
          if (r1(n - 6)) { s = s.dropRight(2); true } else false
        case Some(x @ ("achtig" | "achtiger" | "achtigst")) =>
          if (r1(n - x.length)) { s = s.dropRight(x.length); true }
          else false
        case Some(x @ ("end" | "erig" | "eriger" | "erigst")) =>
          if (r1(n - x.length) && tC(s, n - x.length)) {
            s = lengthenV(s.dropRight(x.length)); true
          } else false
        case _ => false
      }
      first || {
        val m = s.length
        longest(s, Seq("iger", "igst", "ig")) match {
          case Some(x) if r1(m - x.length) && tC(s, m - x.length) =>
            s = lengthenV(s.dropRight(x.length)); true
          case _ => false
        }
      }
    }

    // ---- Step 1c: d/t cleanup after ge-removal ----
    def step1c(): Boolean = {
      val n = s.length
      if (n >= 1 && s(n - 1) == 'd' && r1(n - 1) && tC(s, n - 1) &&
        !(n >= 2 && s(n - 2) == 'n' && r1(n - 2))) {
        s = s.dropRight(1); true
      } else if (n >= 1 && s(n - 1) == 't' && r1(n - 1) && tC(s, n - 1) &&
        !(n >= 2 && s(n - 2) == 'h' && r1(n - 2))) {
        s = s.dropRight(1); true
      } else false
    }

    // ---- Step 7: kt/ft/pt; Step 6: undouble + final v/z ----
    def step7(): Boolean =
      longest(s, Seq("kt", "ft", "pt")) match {
        case Some(_) => s = s.dropRight(1); true
        case None => false
      }
    def step6(): Boolean = {
      val doubles = Seq("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk",
        "ll", "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
        "xx", "zz")
      longest(s, doubles ++ Seq("v", "z")) match {
        case Some(d) if d.length == 2 => s = s.dropRight(1); true
        case Some("v") => s = s.dropRight(1) + "f"; true
        case Some("z") => s = s.dropRight(1) + "s"; true
        case _ => false
      }
    }

    // ---- ge- prefix / -ge- infix removal ----
    def vowelThenCons(from: Int): Boolean = {
      var j = from
      while (j < s.length && !isV(s(j))) j += 1
      if (j >= s.length) return false
      j += 1
      while (j < s.length && isV(s(j))) j += 1
      j < s.length
    }
    def losePrefix(): Boolean =
      if (s.startsWith("ge") && s.length >= 5 && vowelThenCons(2)) {
        s = s.substring(2); true
      } else false
    def loseInfix(): Boolean = {
      val i = s.indexOf("ge", 1)
      if (i >= 1 && s.length >= i + 5 && vowelThenCons(i + 2)) {
        s = s.substring(0, i) + s.substring(i + 2); true
      } else false
    }

    if (step1()) stemmed = true
    if (step2()) stemmed = true
    if (step3()) stemmed = true
    if (step4()) stemmed = true
    var geRemoved = false
    if (losePrefix()) {
      geRemoved = true
      val m = measure(s); p1 = m._1; p2 = m._2
    }
    if (geRemoved) step1c()
    if (loseInfix()) {
      geRemoved = true
      val m = measure(s); p1 = m._1; p2 = m._2
    }
    if (geRemoved) step1c()
    if (step7()) stemmed = true
    if (stemmed || geRemoved) step6()

    if (yFound) s.replace('Y', 'y') else s
  }
}
