package graft.analysis

import graft.analysis.Analyzer.Token

/** Non-Latin analyzer family from the reference's contrib Analyzers —
  * each re-expressed as a pure `String => Vector[Token]` (the same
  * contract as [[Analyzers.tokenize]]):
  *
  *  - CJK bigrams (CJKAnalyzer.cs / CJKTokenizer.cs:36-48: CJK runs
  *    emit overlapping two-char tokens, Latin/digit runs emit one
  *    lowercased token; "java C1C2C3" → java, C1C2, C2C3)
  *  - Chinese unigrams (Cn/ChineseTokenizer.cs: one token per CJK
  *    char) + ChineseFilter.cs:38-55 (drop English stop words and
  *    single Latin letters)
  *  - Greek lowercase fold (El/GreekAnalyzer.cs GreekLowerCaseFilter:
  *    lowercase, strip tonos/dialytika accents, final sigma ς → σ)
  *  - Arabic normalizer + light stemmer (AR/ArabicNormalizer.cs:
  *    hamza-carrying alefs → bare alef, dotless yeh → yeh, teh marbuta
  *    → heh, strip tatweel + harakat; AR/ArabicStemmer.cs:57-77: one
  *    definite-article/waw prefix, then the light suffix sweep)
  *  - Persian normalizer (Fa/PersianNormalizer.cs: arabic yeh/yeh
  *    barree → farsi yeh, arabic kaf → keheh, heh hamza → heh, strip
  *    hamza above)
  *  - Thai word segmentation (Th/ThaiWordFilter.cs: the JDK's
  *    dictionary-based BreakIterator for the Thai locale re-segments
  *    Thai runs; Latin runs pass through the standard treatment)
  */
object IntlAnalyzers {

  // ---- CJK ----

  private def isCjkChar(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
    b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS ||
    b == Character.UnicodeBlock.HIRAGANA ||
    b == Character.UnicodeBlock.KATAKANA ||
    b == Character.UnicodeBlock.HANGUL_SYLLABLES ||
    b == Character.UnicodeBlock.HANGUL_JAMO
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) && !isCjkChar(c)

  /** Split into (run, isCjk) segments; non-word, non-CJK chars break. */
  private def runsOf(text: String): Vector[(String, Boolean)] = {
    if (text == null) return Vector.empty
    val out = Vector.newBuilder[(String, Boolean)]
    val sb = new StringBuilder
    var cjk = false
    def flush(): Unit = if (sb.nonEmpty) { out += ((sb.toString, cjk)); sb.clear() }
    text.foreach { c =>
      if (isCjkChar(c)) {
        if (!cjk) flush(); cjk = true; sb.append(c)
      } else if (isWordChar(c)) {
        if (cjk) flush(); cjk = false
        sb.append(Character.toLowerCase(c))
      } else flush()
    }
    flush()
    out.result()
  }

  /** CJKTokenizer bigram scan. Positions are sequential over emitted
    * tokens (the reference emits each bigram with increment 1). */
  def cjkBigrams(text: String): Vector[Token] = {
    val toks = runsOf(text).flatMap {
      case (run, true) if run.length == 1 => Vector(run)
      case (run, true) => run.sliding(2).toVector
      case (run, false) => Vector(run)
    }
    toks.zipWithIndex.map { case (t, i) => Token(t, i) }
  }

  /** ChineseTokenizer (single-char CJK tokens) + ChineseFilter (drop
    * English stop words and 1-letter Latin tokens); positions keep
    * gaps where the filter dropped. */
  def chineseTokens(text: String): Vector[Token] = {
    val toks = runsOf(text).flatMap {
      case (run, true) => run.map(_.toString)
      case (run, false) => Vector(run)
    }
    toks.zipWithIndex.collect {
      case (t, i) if !(t.length == 1 && t.charAt(0) >= 'a' &&
        t.charAt(0) <= 'z') && !Analyzer.StopWords(t) => Token(t, i)
    }.toVector
  }

  // ---- Greek ----

  private val GreekFold = Map(
    'ά' -> 'α', 'έ' -> 'ε', 'ή' -> 'η', 'ί' -> 'ι', 'ϊ' -> 'ι',
    'ΐ' -> 'ι', 'ό' -> 'ο', 'ύ' -> 'υ', 'ϋ' -> 'υ', 'ΰ' -> 'υ',
    'ώ' -> 'ω', 'ς' -> 'σ')

  /** GreekLowerCaseFilter: lowercase, un-accent, final sigma → σ. */
  def greekFold(t: String): String =
    t.toLowerCase(java.util.Locale.ROOT).map(c => GreekFold.getOrElse(c, c))

  // ---- Arabic ----

  private val ArabicDiacritics =
    Set('ـ', // tatweel
      'ً', 'ٌ', 'ٍ', 'َ', 'ُ', 'ِ',
      'ّ', 'ْ') // fathatan..sukun

  /** ArabicNormalizer.cs: أ/إ/آ → ا, ى → ي, ة → ه, strip tatweel and
    * the harakat marks. */
  def arabicNormalize(t: String): String =
    t.flatMap {
      case 'آ' | 'أ' | 'إ' => "ا" // alef variants
      case 'ى' => "ي"                       // dotless yeh
      case 'ة' => "ه"                       // teh marbuta → heh
      case c if ArabicDiacritics(c) => ""
      case c => c.toString
    }

  private val ArabicPrefixes = Seq(
    "ال",             // ال
    "وال",       // وال
    "بال",       // بال
    "كال",       // كال
    "فال",       // فال
    "لل",             // لل
    "و")                   // و
  private val ArabicSuffixes = Seq(
    "ها",             // ها
    "ان",             // ان
    "ات",             // ات
    "ون",             // ون
    "ين",             // ين
    "يه",             // يه
    "ية",             // ية
    "ه",                   // ه
    "ة",                   // ة
    "ي")                   // ي

  /** The light stemmer (ArabicStemmer.cs:88-123): the FIRST matching
    * prefix strips once; then the suffix list sweeps in order, each
    * stripping at most once but cumulatively. */
  def arabicStem(word: String): String = {
    var s = word
    ArabicPrefixes.find(s.startsWith).foreach(p => s = s.substring(p.length))
    ArabicSuffixes.foreach { suf =>
      if (s.endsWith(suf) && s.length > suf.length)
        s = s.substring(0, s.length - suf.length)
    }
    s
  }

  // ---- Persian ----

  /** PersianNormalizer.cs: arabic yeh ي / yeh barree ے → farsi yeh ی,
    * arabic kaf ك → keheh ک, heh+hamza ۀ / heh goal ہ → heh ه, strip
    * hamza above. */
  def persianNormalize(t: String): String =
    t.flatMap {
      case 'ي' | 'ے' => "ی"
      case 'ك' => "ک"
      case 'ۀ' | 'ہ' => "ه"
      case 'ٔ' => ""
      case c => c.toString
    }

  // ---- Thai ----

  private def isThaiChar(c: Char): Boolean =
    Character.UnicodeBlock.of(c) == Character.UnicodeBlock.THAI

  /** ThaiWordFilter.cs: dictionary BreakIterator segmentation of Thai
    * runs (the JDK ships the same ICU-derived Thai dictionary the
    * reference relies on); Latin runs lowercase as single tokens.
    * BreakIterator is not thread-safe → one instance per call (the
    * reference clones per TokenStream the same way). */
  def thaiTokens(text: String): Vector[Token] = {
    if (text == null) return Vector.empty
    val bi = java.text.BreakIterator.getWordInstance(
      java.util.Locale.forLanguageTag("th"))
    val out = Vector.newBuilder[String]
    // reuse the CJK run splitter's word/non-word walk, but keep Thai
    // chars as their own run kind
    val sb = new StringBuilder
    var thai = false
    def flush(): Unit = {
      if (sb.nonEmpty) {
        val run = sb.toString
        if (thai) {
          bi.setText(run)
          var start = bi.first()
          var end = bi.next()
          while (end != java.text.BreakIterator.DONE) {
            val w = run.substring(start, end)
            if (w.exists(Character.isLetterOrDigit)) out += w
            start = end; end = bi.next()
          }
        } else out += run
        sb.clear()
      }
    }
    text.foreach { c =>
      if (isThaiChar(c)) {
        if (!thai) flush(); thai = true; sb.append(c)
      } else if (Character.isLetterOrDigit(c)) {
        if (thai) flush(); thai = false
        sb.append(Character.toLowerCase(c))
      } else flush()
    }
    flush()
    out.result().zipWithIndex.collect {
      case (t, i) if !Analyzer.StopWords(t) => Token(t, i)
    }
  }
}
