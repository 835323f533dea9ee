package graft.analysis

/** Turkish stemmer, implemented from the published Snowball Turkish
  * stemming algorithm (E. Kapusuz Çilden's algorithm in M.F. Porter's
  * Snowball project; the reference ships the Snowball-compiler output
  * at /root/reference/src/contrib/Snowball/SF/Snowball/Ext/TurkishStemmer.cs:11).
  *
  * Suffix-stripping only, driven by two ordered rule trees evaluated
  * right-to-left with a mark/delete bracket (deletions can excise an
  * INTERIOR run, e.g. the `daki` of odadakinde, because the ki-chain
  * re-opens the bracket mid-word):
  *  - nominal verb suffixes (ymUs_/yDU/ysA/yken/cAsInA/DUr/sUnUz…);
  *    the lAr+DUr family clears the continue flag, which stops ALL
  *    further stemming (noun suffixes and postlude are skipped);
  *  - noun suffixes (lAr/ncA/ndA/nA/ndAn/nU/DAn/nUn/ylA/lArI/DA/yU/yA/
  *    possessives/sU) with the recursive suffix-chain-before-ki.
  * Every vowel-bearing suffix family checks VOWEL HARMONY: the last
  * vowel must be followed (scanning further left, any distance) by a
  * member of its harmony class (a:aıou e:eiöü ı:aı i:ei o:ou ö:öü
  * u:ou ü:öü). Optional buffer consonants y/n/s attach only over a
  * vowel, the optional U vowel only over a consonant.
  * Postlude (skipped for the reserved words ad/soyad): stems ending in
  * d/g get the harmonizing high vowel APPENDED, then a final
  * b/c/d/ğ devoices to p/ç/t/k. Words with fewer than two vowels are
  * never touched.
  */
object TurkishStemmer {

  private val Vowels = "aeıioöuü".toSet
  private val USet = "ıiuü".toSet
  private val Harmony: Map[Char, Set[Char]] = Map(
    'a' -> "aıou".toSet, 'e' -> "eiöü".toSet,
    'ı' -> "aı".toSet, 'i' -> "ei".toSet,
    'o' -> "ou".toSet, 'ö' -> "öü".toSet,
    'u' -> "ou".toSet, 'ü' -> "öü".toSet)

  @inline private def isV(c: Char): Boolean = Vowels(c)

  /** Mutable backward-mode state: `cur` is the cursor (left edge of
    * everything matched so far), `ket` the bracket's right edge. */
  private final class T(var s: String) {
    var cur: Int = s.length
    var ket: Int = s.length
    def mark(): Unit = ket = cur
    def del(): Unit = { s = s.substring(0, cur) + s.substring(ket); ket = cur }
  }

  /** check_vowel_harmony at cursor c: last vowel before c, then ANY
    * earlier vowel in its harmony class. */
  private def harmony(s: String, c: Int): Boolean = {
    var i = c - 1
    while (i >= 0 && !isV(s(i))) i -= 1
    if (i < 0) return false
    val set = Harmony.getOrElse(s(i), Set.empty)
    var j = i - 1
    while (j >= 0) { if (set(s(j))) return true; j -= 1 }
    false
  }

  /** Optional buffer consonant `ch` before cursor c: present → must sit
    * on a vowel (consume it); absent → the char two back must still be
    * a vowel. */
  private def optCons(s: String, c: Int, ch: Char): Option[Int] =
    if (c >= 1 && s(c - 1) == ch) {
      if (c >= 2 && isV(s(c - 2))) Some(c - 1) else None
    } else if (c >= 2 && isV(s(c - 2))) Some(c) else None

  /** Optional U vowel before cursor c (mirror image: U sits on a
    * consonant). */
  private def optU(s: String, c: Int): Option[Int] =
    if (c >= 1 && USet(s(c - 1))) {
      if (c >= 2 && !isV(s(c - 2))) Some(c - 1) else None
    } else if (c >= 2 && !isV(s(c - 2))) Some(c) else None

  private def among(s: String, c: Int, sufs: Seq[String]): Option[Int] = {
    val pre = s.substring(0, c)
    sufs.filter(pre.endsWith).sortBy(-_.length).headOption.map(c - _.length)
  }

  // ---- mark_* routines: Option[new cursor] given (s, c) ----
  private def mPoss(s: String, c: Int) =
    among(s, c, Seq("miz", "niz", "muz", "nuz", "müz", "nüz", "mız",
      "nız", "m", "n")).flatMap(optU(s, _))
  private def mSU(s: String, c: Int) =
    if (harmony(s, c) && c >= 1 && USet(s(c - 1))) optCons(s, c - 1, 's')
    else None
  private def mLArI(s: String, c: Int) = among(s, c, Seq("leri", "ları"))
  private def mYU(s: String, c: Int) =
    if (harmony(s, c) && c >= 1 && USet(s(c - 1))) optCons(s, c - 1, 'y')
    else None
  private def mNU(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("nı", "ni", "nu", "nü")) else None
  private def mNUn(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("ın", "in", "un", "ün")).flatMap(optCons(s, _, 'n'))
    else None
  private def mYA(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("a", "e")).flatMap(optCons(s, _, 'y'))
    else None
  private def mNA(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("na", "ne")) else None
  private def mDA(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("da", "ta", "de", "te")) else None
  private def mNdA(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("nda", "nde")) else None
  private def mDAn(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("dan", "tan", "den", "ten"))
    else None
  private def mNdAn(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("ndan", "nden")) else None
  private def mYlA(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("la", "le")).flatMap(optCons(s, _, 'y'))
    else None
  private def mKi(s: String, c: Int) =
    if (c >= 2 && s.substring(c - 2, c) == "ki") Some(c - 2) else None
  private def mNcA(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("ca", "ce")).flatMap(optCons(s, _, 'n'))
    else None
  private def mYUm(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("im", "um", "üm", "ım")).flatMap(optCons(s, _, 'y'))
    else None
  private def mSUn(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("sin", "sun", "sün", "sın"))
    else None
  private def mYUz(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("iz", "uz", "üz", "ız")).flatMap(optCons(s, _, 'y'))
    else None
  private def mSUnUz(s: String, c: Int) =
    among(s, c, Seq("siniz", "sunuz", "sünüz", "sınız"))
  private def mLAr(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("lar", "ler")) else None
  private def mNUz(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("niz", "nuz", "nüz", "nız"))
    else None
  private def mDUr(s: String, c: Int) =
    if (harmony(s, c)) among(s, c, Seq("dir", "tir", "dur", "tur",
      "dür", "tür", "dır", "tır"))
    else None
  private def mCAsInA(s: String, c: Int) =
    among(s, c, Seq("casına", "cesine"))
  private def mYDU(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("dik", "tik", "duk", "tuk", "dük", "tük", "dık",
        "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
        "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
        "di", "ti", "du", "tu", "dü", "tü", "dı", "tı"))
        .flatMap(optCons(s, _, 'y'))
    else None
  private def mYsA(s: String, c: Int) =
    among(s, c, Seq("sak", "sek", "sam", "sem", "san", "sen", "sa", "se"))
      .flatMap(optCons(s, _, 'y'))
  private def mYmUs(s: String, c: Int) =
    if (harmony(s, c))
      among(s, c, Seq("miş", "muş", "müş", "mış"))
        .flatMap(optCons(s, _, 'y'))
    else None
  private def mYken(s: String, c: Int) =
    if (c >= 3 && s.substring(c - 3, c) == "ken")
      optCons(s, c - 3, 'y')
    else None

  // ---- nominal verb suffixes; returns the continue flag ----
  private def nominalVerb(t: T): Boolean = {
    t.cur = t.s.length
    t.mark() // [
    var flag = true
    def m(f: (String, Int) => Option[Int]): Boolean =
      f(t.s, t.cur) match { case Some(nc) => t.cur = nc; true; case None => false }
    val matched =
      // (ymUs_ or yDU or ysA or yken)
      m(mYmUs) || m(mYDU) || m(mYsA) || m(mYken) || {
        // (cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_)
        val save = t.cur
        (m(mCAsInA) && {
          val _ = m(mSUnUz) || m(mLAr) || m(mYUm) || m(mSUn) || m(mYUz)
          m(mYmUs) || { t.cur = save; false }
        }) || {
          // (lAr ] delete try([ (DUr|yDU|ysA|ymUs_)) unset flag)
          t.cur = save
          (m(mLAr) && {
            t.del()
            t.mark()
            val s2 = t.cur
            if (!(m(mDUr) || m(mYDU) || m(mYsA) || m(mYmUs))) t.cur = s2
            flag = false
            true
          }) || {
            // (nUz (yDU or ysA))
            t.cur = save
            (m(mNUz) && (m(mYDU) || m(mYsA) || { t.cur = save; false })) || {
              // ((sUnUz|yUz|sUn|yUm) ] delete try([ ymUs_))
              t.cur = save
              ((m(mSUnUz) || m(mYUz) || m(mSUn) || m(mYUm)) && {
                t.del()
                t.mark()
                val s3 = t.cur
                if (!m(mYmUs)) t.cur = s3
                true
              }) || {
                // (DUr ] delete try([ (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_))
                t.cur = save
                m(mDUr) && {
                  t.del()
                  t.mark()
                  val s4 = t.cur
                  val _ = m(mSUnUz) || m(mLAr) || m(mYUm) || m(mSUn) || m(mYUz)
                  if (!m(mYmUs)) t.cur = s4
                  true
                }
              }
            }
          }
        }
      }
    if (matched) t.del() // the step's trailing ] delete
    flag
  }

  // ---- stem_suffix_chain_before_ki (recursive) ----
  private def chainKi(t: T): Boolean = {
    def m(f: (String, Int) => Option[Int]): Boolean =
      f(t.s, t.cur) match { case Some(nc) => t.cur = nc; true; case None => false }
    val entry = t.cur
    t.mark() // [
    if (!m(mKi)) return false
    val afterKi = t.cur
    // branch DA
    if (m(mDA)) {
      t.del()
      val s1 = t.cur
      t.mark()
      val ok =
        (m(mLAr) && { t.del(); val s2 = t.cur; if (!chainKi(t)) t.cur = s2; true }) || {
          t.cur = s1
          m(mPoss) && {
            t.del()
            val s3 = t.cur
            t.mark()
            if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s3
            true
          }
        }
      if (!ok) t.cur = s1
      return true
    }
    t.cur = afterKi
    // branch nUn
    if (m(mNUn)) {
      t.del()
      val s1 = t.cur
      t.mark()
      val ok =
        (m(mLArI) && { t.del(); true }) || {
          t.cur = s1
          t.mark()
          ((m(mPoss) || m(mSU)) && {
            t.del()
            val s2 = t.cur
            t.mark()
            if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
            true
          }) || { t.cur = s1; chainKi(t) }
        }
      if (!ok) t.cur = s1
      return true
    }
    t.cur = afterKi
    // branch ndA
    if (m(mNdA)) {
      val s1 = t.cur
      if (m(mLArI)) { t.del(); return true }
      t.cur = s1
      if (m(mSU)) {
        t.del()
        val s2 = t.cur
        t.mark()
        if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
        return true
      }
      t.cur = s1
      if (chainKi(t)) return true
      t.cur = entry
      return false
    }
    t.cur = entry
    false
  }

  // ---- stem_noun_suffixes ----
  private def nounSuffixes(t: T): Boolean = {
    def m(f: (String, Int) => Option[Int]): Boolean =
      f(t.s, t.cur) match { case Some(nc) => t.cur = nc; true; case None => false }
    def reset(): Unit = { t.cur = t.s.length; t.mark() }

    // B1: [ lAr ] delete try(chainKi)
    reset()
    if (m(mLAr)) {
      t.del()
      val s1 = t.cur
      if (!chainKi(t)) t.cur = s1
      return true
    }
    // B2: [ ncA ] delete try( ([lArI] del) | ([(poss|sU)] del try([lAr] del chainKi)) | ([lAr] del chainKi) )
    reset()
    if (m(mNcA)) {
      t.del()
      val s1 = t.cur
      t.mark()
      val done =
        (m(mLArI) && { t.del(); true }) || {
          t.cur = s1
          t.mark()
          ((m(mPoss) || m(mSU)) && {
            t.del()
            val s2 = t.cur
            t.mark()
            if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
            true
          }) || {
            t.cur = s1
            t.mark()
            m(mLAr) && { t.del(); chainKi(t) }
          }
        }
      if (!done) t.cur = s1
      return true
    }
    // B3: [ (ndA|nA) ( (lArI ] del) | (sU ] del try([lAr] del chainKi)) | chainKi )
    reset()
    if (m(mNdA) || m(mNA)) {
      val s1 = t.cur
      if (m(mLArI)) { t.del(); return true }
      t.cur = s1
      if (m(mSU)) {
        t.del()
        val s2 = t.cur
        t.mark()
        if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
        return true
      }
      t.cur = s1
      if (chainKi(t)) return true
    }
    // B4: [ (ndAn|nU) ( (sU ] del try([lAr] del chainKi)) | lArI )
    reset()
    if (m(mNdAn) || m(mNU)) {
      val s1 = t.cur
      if (m(mSU)) {
        t.del()
        val s2 = t.cur
        t.mark()
        if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
        return true
      }
      t.cur = s1
      if (m(mLArI)) return true
    }
    // B5: [ DAn ] del try([ ( (poss ] del try([lAr] del chainKi)) | (lAr ] del try(chainKi)) | chainKi ))
    reset()
    if (m(mDAn)) {
      t.del()
      val s1 = t.cur
      t.mark()
      val done =
        (m(mPoss) && {
          t.del()
          val s2 = t.cur
          t.mark()
          if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
          true
        }) || {
          t.cur = s1
          (m(mLAr) && {
            t.del()
            val s3 = t.cur
            if (!chainKi(t)) t.cur = s3
            true
          }) || { t.cur = s1; chainKi(t) }
        }
      if (!done) t.cur = s1
      return true
    }
    // B6: [ (nUn|ylA) ] del try( ([lAr] del chainKi) | ([(poss|sU)] del try([lAr] del chainKi)) | chainKi )
    reset()
    if (m(mNUn) || m(mYlA)) {
      t.del()
      val s1 = t.cur
      val done = {
        t.mark()
        (m(mLAr) && { t.del(); chainKi(t) }) || {
          t.cur = s1
          t.mark()
          ((m(mPoss) || m(mSU)) && {
            t.del()
            val s2 = t.cur
            t.mark()
            if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s2
            true
          }) || { t.cur = s1; chainKi(t) }
        }
      }
      if (!done) t.cur = s1
      return true
    }
    // B7: [ lArI ] delete
    reset()
    if (m(mLArI)) { t.del(); return true }
    // B8: chainKi
    reset()
    if (chainKi(t)) return true
    // B9: [ (DA|yU|yA) ] del try([ ((poss ] del try([lAr)) | lAr) ] del [ chainKi)
    reset()
    if (m(mDA) || m(mYU) || m(mYA)) {
      t.del()
      val s1 = t.cur
      t.mark()
      val done = {
        val inner =
          (m(mPoss) && {
            t.del()
            val s2 = t.cur
            t.mark()
            if (!m(mLAr)) t.cur = s2
            true
          }) || { t.cur = s1; m(mLAr) }
        inner && {
          t.del()
          t.mark()
          chainKi(t)
        }
      }
      if (!done) t.cur = s1
      return true
    }
    // B10: [ (poss|sU) ] del try([ lAr ] del chainKi)
    reset()
    if (m(mPoss) || m(mSU)) {
      t.del()
      val s1 = t.cur
      t.mark()
      if (!(m(mLAr) && { t.del(); chainKi(t) })) t.cur = s1
      return true
    }
    false
  }

  def stem(word: String): String = {
    if (word == null) return ""
    val w = word.toLowerCase(java.util.Locale.ROOT)
    if (w.count(isV) < 2) return w // more_than_one_syllable_word
    val t = new T(w)
    val continue = nominalVerb(t)
    if (!continue) return t.s // flag unset: noun suffixes AND postlude skipped
    nounSuffixes(t)
    var s = t.s
    // ---- postlude (skipped entirely for the reserved words) ----
    if (s == "ad" || s == "soyad") return s
    // append_U_to_stems_ending_with_d_or_g
    if (s.nonEmpty && (s.last == 'd' || s.last == 'g')) {
      var i = s.length - 1
      while (i >= 0 && !isV(s(i))) i -= 1
      if (i >= 0) s(i) match {
        case 'a' | 'ı' => s = s + "ı"
        case 'e' | 'i' => s = s + "i"
        case 'o' | 'u' => s = s + "u"
        case 'ö' | 'ü' => s = s + "ü"
        case _ => ()
      }
    }
    // post_process_last_consonants
    if (s.nonEmpty) s.last match {
      case 'b' => s = s.dropRight(1) + "p"
      case 'c' => s = s.dropRight(1) + "ç"
      case 'd' => s = s.dropRight(1) + "t"
      case 'ğ' => s = s.dropRight(1) + "k"
      case _ => ()
    }
    s
  }
}
