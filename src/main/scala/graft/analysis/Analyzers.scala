package graft.analysis

import java.text.Normalizer

import graft.analysis.Analyzer.Token

/** Analyzer variants beyond the StandardAnalyzer chain, mirroring the
  * reference's analyzer family (SURVEY.md §2.2):
  *  - Whitespace (WhitespaceAnalyzer.cs:25): split on whitespace, no
  *    case folding
  *  - Simple (SimpleAnalyzer.cs:27): maximal letter runs, lowercased
  *  - Keyword (KeywordAnalyzer.cs:26): whole value as one term
  *  - Stop (StopAnalyzer.cs:45-50): Simple + the 33-word stop set
  *    (position gaps preserved, StopFilter.cs:52)
  *  - Standard: the default chain in [[Analyzer]]
  *  - English: Standard + PorterStemFilter (PorterStemFilter.cs:42)
  *  - Folding: ASCIIFoldingFilter (ASCIIFoldingFilter.cs:58) before the
  *    Standard chain
  *
  * Each is a pure `String => Vector[Token]`, pluggable into the index
  * build (the per-field/PerFieldAnalyzerWrapper story stays config-level:
  * keyword columns are simply not analyzed).
  */
object Analyzers {

  sealed trait Kind
  case object Standard extends Kind
  case object Whitespace extends Kind
  case object Simple extends Kind
  case object Keyword extends Kind
  case object Stop extends Kind
  case object English extends Kind
  case object Folding extends Kind
  /** GermanAnalyzer.cs:41 analog: Standard tokens → German stop set →
    * Snowball German stemmer. */
  case object German extends Kind
  /** The reference De chain's OWN stemmer (GermanStemmer.cs:34, the
    * Caumanns 1999 algorithm — golden-validated in GermanGoldenSpec);
    * `din2` switches to the DIN-5007-2 phone-book umlaut rules
    * (GermanDIN2Stemmer.cs:13). */
  final case class GermanCaumanns(din2: Boolean = false) extends Kind
  /** FrenchAnalyzer.cs:46 analog: Standard tokens → elision (l'avion →
    * avion, ElisionFilter.cs:56 default article set) → French stop
    * set → Snowball French stemmer. */
  case object French extends Kind
  /** SnowballAnalyzer("Spanish") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/SpanishStemmer.cs:11): Standard tokens → Spanish stop set
    * (the published Snowball list's core) → Snowball Spanish stemmer. */
  case object Spanish extends Kind
  /** SnowballAnalyzer("Italian") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/ItalianStemmer.cs:11): Standard tokens → Italian elision
    * (l'arte → arte) → Italian stop set → Snowball Italian stemmer. */
  case object Italian extends Kind
  /** RussianAnalyzer.cs:79 analog with the Snowball stemmer
    * (Ext/RussianStemmer.cs:11; the reference's own contrib/Analyzers/Ru
    * stemmer is the OLDER table-driven algorithm — documented
    * deviation): Standard tokens → RUSSIAN_STOP_WORDS
    * (RussianAnalyzer.cs:43-64) → Snowball Russian stemmer. */
  case object Russian extends Kind
  /** SnowballAnalyzer("Swedish") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/SwedishStemmer.cs:11): Standard tokens → Swedish stop set
    * (the published Snowball list) → Snowball Swedish stemmer. */
  case object Swedish extends Kind
  /** SnowballAnalyzer("Danish") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/DanishStemmer.cs:11): Standard tokens → Danish stop set
    * (the published Snowball list) → Snowball Danish stemmer. */
  case object Danish extends Kind
  /** SnowballAnalyzer("Norwegian") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/NorwegianStemmer.cs:11): Standard tokens → Norwegian stop set
    * (Bokmål core of the published Snowball list) → Snowball Norwegian
    * stemmer. */
  case object Norwegian extends Kind
  /** SnowballAnalyzer("Dutch") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/DutchStemmer.cs:11): Standard tokens → Dutch stop set (the
    * published Snowball list) → Snowball Dutch stemmer. */
  case object Dutch extends Kind
  /** SnowballAnalyzer("Portuguese") analog (SnowballAnalyzer.cs:39
    * wraps Ext/PortugueseStemmer.cs:11): Standard tokens → Portuguese
    * stop set (core of the published Snowball list) → Snowball
    * Portuguese stemmer. */
  case object Portuguese extends Kind
  /** BrazilianAnalyzer.cs:202-210 analog: Standard tokens → the
    * reference's own (unaccented) Brazilian stop set → the BR chain's
    * OWN accent-folding stemmer ([[BrazilianStemmer]], golden-validated
    * in BrazilianGoldenSpec) — NOT the Snowball Portuguese algorithm
    * of [[Portuguese]]: stems come out unaccented. */
  case object Brazilian extends Kind
  /** SnowballAnalyzer("Finnish") analog (SnowballAnalyzer.cs:39 wraps
    * Ext/FinnishStemmer.cs:11): Standard tokens → Finnish stop set
    * (core of the published Snowball list) → Snowball Finnish
    * stemmer. */
  case object Finnish extends Kind
  /** CJKAnalyzer.cs analog: overlapping CJK bigrams + lowercased Latin
    * runs, then the English stop set. */
  case object Cjk extends Kind
  /** Cn/ChineseAnalyzer.cs analog: CJK unigrams + ChineseFilter (drop
    * stop words and single Latin letters). */
  case object Chinese extends Kind
  /** Cz/CzechAnalyzer.cs analog: Standard tokens → Czech stop set (the
    * reference's CzechAnalyzer has no stemmer). */
  case object Czech extends Kind
  /** El/GreekAnalyzer.cs analog: Standard tokens → GreekLowerCaseFilter
    * fold (un-accent, ς→σ) → Greek stop set (folded forms). */
  case object Greek extends Kind
  /** Fa/PersianAnalyzer.cs analog: Standard tokens → Arabic + Persian
    * normalization → Persian stop set (normalized forms). */
  case object Persian extends Kind
  /** Th/ThaiAnalyzer.cs analog: dictionary BreakIterator segmentation
    * of Thai runs + the English stop set. */
  case object Thai extends Kind
  /** AR/ArabicAnalyzer.cs analog: Standard tokens → Arabic stop set →
    * ArabicNormalizationFilter → light ArabicStemFilter. */
  case object Arabic extends Kind
  /** ShingleAnalyzerWrapper analog (contrib Shingle): the Standard
    * chain's kept tokens plus their n-grams — as a Kind so shingled
    * INDEXES can be built (IndexWriter-takes-Analyzer pluggability). */
  final case class Shingles(n: Int = 2, keepUnigrams: Boolean = true)
    extends Kind
  /** DictionaryCompoundWordTokenFilter analog (contrib Compound,
    * DictionaryCompoundWordTokenFilter.cs:93-140 over
    * CompoundWordTokenFilterBase.cs Decompose): Standard chain, then
    * dictionary subwords of long tokens emitted at the compound's
    * position. Subword length bounds are inclusive [min, max] (the
    * generated port's loop has an off-by-one that scans
    * [min−1, max−1] — we implement the documented intent). */
  final case class Decompound(dict: Set[String],
      minWordSize: Int = 5, minSubword: Int = 2, maxSubword: Int = 15,
      onlyLongestMatch: Boolean = false) extends Kind
  /** HyphenationCompoundWordTokenFilter analog (contrib Compound; the
    * reference file's body is a commented-out unfinished port — these
    * are its documented semantics): Standard chain, then each long
    * token's Knuth–Liang hyphenation points ([[Hyphenator]]) bound the
    * candidate subwords — only spans between two hyphenation points
    * are dictionary-checked, unlike [[Decompound]]'s every-offset
    * scan — with the reference's last-char-dropped retry (so
    * genitive-s compounds like "arbeitsplatz" still yield "arbeit").
    * Subwords are emitted at the compound's position. */
  final case class HyphenDecompound(patterns: Seq[String],
      dict: Set[String], exceptions: Seq[String] = Nil,
      minWordSize: Int = 5, minSubword: Int = 2, maxSubword: Int = 15,
      onlyLongestMatch: Boolean = false) extends Kind
  /** Reverse/ReverseStringFilter.cs analog: every kept Standard token
    * reversed in place. The reference's leading-wildcard mechanism —
    * index a reversed twin field and `*suffix` becomes a PREFIX scan
    * there (block-pushdown-able) instead of a full-dictionary regex. */
  case object Reversed extends Kind
  /** NGram/EdgeNGramTokenFilter.cs (front edge) analog: the
    * minGram..maxGram PREFIXES of each kept Standard token, emitted at
    * the token's position — the autocomplete index shape. */
  final case class EdgeNgrams(minGram: Int = 1, maxGram: Int = 5)
    extends Kind
  /** Miscellaneous/PatternAnalyzer.cs analog: the regex is the token
    * SEPARATOR (String.split semantics), tokens lowercased, optional
    * Standard stop set — the CSV/log-line tokenizer. */
  final case class Pattern(separator: String, stops: Boolean = true)
    extends Kind
  /** Position/PositionFilter.cs analog: the first token of the wrapped
    * chain keeps its position; every later token advances by the fixed
    * `increment` instead of its own (increment 0 stacks the whole
    * stream on one position — the query-time synonym/shingle trick). */
  final case class Positioned(increment: Int = 0, inner: Kind = Standard)
    extends Kind
  /** DutchStemFilter.cs:126 SetStemDictionary + the stem-exclusion
    * tables of the De/Fr/Nl analyzers (GermanAnalyzer.cs
    * SetStemExclusionTable et al.), generalized over every stop+stem
    * chain: an excluded token passes through unstemmed; an overridden
    * token maps to its fixed stem (checked before the stemmer, like the
    * reference — test corpus test/contrib/Analyzers/Nl/customStemDict
    * .txt). Both apply to the chain's PRE-normalized token. Wrapping
    * Standard (identity stem) is legal and acts as a pure
    * StemmerOverrideFilter: overrides rewrite listed terms, exclusions
    * are no-ops. */
  final case class StemAdjusted(inner: Kind,
      overrides: Map[String, String] = Map.empty,
      exclusions: Set[String] = Set.empty) extends Kind
  /** The custom-stop-set constructor every reference analyzer exposes
    * (e.g. StandardAnalyzer(stopWords), CzechAnalyzer + its custom
    * stop-word file — WordlistLoader.cs:25 loads the set,
    * [[WordLists.wordSet]] here). The set REPLACES the wrapped kind's
    * own stop set for word-token kinds (Standard/Stop/Pattern/Cjk,
    * English, and every stop+stem chain); for stop-free kinds
    * (Whitespace/Simple/Keyword) filtering is the same thing; for
    * derived-token kinds (Reversed/EdgeNgrams/Shingles/…) the listed
    * terms are filtered from the DERIVED output on top of the inner
    * chain's own stops. Position gaps preserved in every case. */
  final case class CustomStops(stops: Set[String], inner: Kind = Standard)
    extends Kind

  /** The shared shape of every language chain: raw word tokens
    * (position = raw-token index, stop gaps preserved — the same
    * coordinate system as the Standard chain), an optional per-token
    * pre-normalization (elision, folding), the language's stop set,
    * then its stemmer. One definition so a fix to the shape (length
    * guard, position semantics) applies to every language at once. */
  private def stopStemChain(text: String, stops: Set[String],
      stem: String => String,
      pre: String => String = identity): Vector[Token] =
    Analyzer.rawTokens(text).iterator.map(pre).zipWithIndex.collect {
      case (t, i) if t.nonEmpty && !stops(t) &&
          t.length <= Analyzer.MaxTokenLength =>
        Token(stem(t), i)
    }.toVector

  /** The (stop set, per-token pre-normalization, stemmer) triple of
    * every stop+stem language chain — one table so [[StemAdjusted]] and
    * [[CustomStops]] can wrap ANY chain's stemmer, and the ONLY list of
    * chain kinds (tokenize dispatches on "returns Some", so a language
    * added here is automatically routed — no second kind list to
    * drift). Standard resolves too (identity stem): the raw-token
    * chain IS Standard's tokenizer, which is what lets CustomStops
    * REPLACE Standard's stop set like StandardAnalyzer(stopWords). */
  private val chainMemo = new scala.collection.concurrent.TrieMap[
    Kind, Option[(Set[String], String => String, String => String)]]()

  /** Memoized — tokenize consults this per document row (twice: guard +
    * body), so the triple is built once per Kind, not per row. Kinds
    * are case values, so they are stable map keys; recursion into a
    * wrapper's inner kind hits a different key (getOrElseUpdate is
    * re-entrant safe for that, at worst computing a triple twice). */
  private def stemChainOf(kind: Kind)
      : Option[(Set[String], String => String, String => String)] =
    chainMemo.getOrElseUpdate(kind, computeStemChain(kind))

  private def computeStemChain(kind: Kind)
      : Option[(Set[String], String => String, String => String)] =
    kind match {
    case Standard =>
      // Standard IS the raw-token chain with the English stop set and
      // no stemmer (tokenize uses fastTokenize for speed; the triple
      // exists so CustomStops can REPLACE the set, and so
      // StemAdjusted(Standard, overrides) acts as a
      // StemmerOverrideFilter over the plain chain)
      Some((Analyzer.StopWords, identity[String] _, identity[String] _))
    case English =>
      Some((Analyzer.StopWords, identity[String] _, PorterStemmer.stem _))
    case German => Some((GermanStopWords, identity, GermanStemmer.stem))
    case GermanCaumanns(din2) => Some((GermanStopWords, identity,
      if (din2) CaumannsGermanStemmer.stemDin2
      else CaumannsGermanStemmer.stem))
    case French => Some((FrenchStopWords, elide, FrenchStemmer.stem))
    case Spanish => Some((SpanishStopWords, identity, SpanishStemmer.stem))
    case Russian => Some((RussianStopWords, identity, RussianStemmer.stem))
    case Italian => Some((ItalianStopWords, elideIt, ItalianStemmer.stem))
    case Swedish => Some((SwedishStopWords, identity, SwedishStemmer.stem))
    case Danish => Some((DanishStopWords, identity, DanishStemmer.stem))
    case Norwegian =>
      Some((NorwegianStopWords, identity, NorwegianStemmer.stem))
    case Dutch => Some((DutchStopWords, identity, DutchStemmer.stem))
    case Portuguese =>
      Some((PortugueseStopWords, identity, PortugueseStemmer.stem))
    case Brazilian =>
      Some((BrazilianStopWords, identity, BrazilianStemmer.stem))
    case Finnish => Some((FinnishStopWords, identity, FinnishStemmer.stem))
    case Czech => Some((CzechStopWords, identity, identity))
    case Greek => Some((GreekStopWords, IntlAnalyzers.greekFold, identity))
    case Persian => Some((PersianStopWords,
      t => IntlAnalyzers.persianNormalize(IntlAnalyzers.arabicNormalize(t)),
      identity))
    // stop check on the RAW token (the reference's Arabic stop list is
    // unnormalized), normalize+stem after
    case Arabic => Some((ArabicStopWords,
      identity,
      t => IntlAnalyzers.arabicStem(IntlAnalyzers.arabicNormalize(t))))
    case StemAdjusted(inner, overrides, exclusions) =>
      stemChainOf(inner).map { case (stops, pre, stem) =>
        (stops, pre,
          (t: String) =>
            if (exclusions(t)) t else overrides.getOrElse(t, stem(t)))
      }
    case CustomStops(stops, inner) =>
      stemChainOf(inner).map { case (_, pre, stem) => (stops, pre, stem) }
    case _ => None
  }

  def tokenize(kind: Kind, text: String): Vector[Token] = kind match {
    case Standard => Analyzer.fastTokenize(text)
    case Positioned(inc, inner) =>
      val ts = tokenize(inner, text)
      ts.zipWithIndex.map { case (t, k) =>
        if (k == 0) t else Token(t.term, ts.head.pos + k * inc) }
    case Reversed =>
      Analyzer.fastTokenize(text).map(t => Token(t.term.reverse, t.pos))
    case EdgeNgrams(lo, hi) =>
      Analyzer.fastTokenize(text).flatMap(t =>
        (lo to math.min(hi, t.term.length)).map(n =>
          Token(t.term.substring(0, n), t.pos)))
    case Pattern(sep, stops) =>
      if (text == null) Vector.empty
      else text.split(sep, -1).iterator.map(_.toLowerCase).zipWithIndex
        .collect {
          case (t, i) if t.nonEmpty && (!stops || !Analyzer.StopWords(t)) &&
              t.length <= Analyzer.MaxTokenLength =>
            Token(t, i)
        }.toVector
    case Whitespace =>
      if (text == null) Vector.empty
      else text.split("\\s+").iterator.filter(_.nonEmpty).zipWithIndex
        .map { case (t, i) => Token(t, i) }.toVector
    case Simple => letterRuns(text).zipWithIndex
      .map { case (t, i) => Token(t, i) }
    case Keyword =>
      if (text == null || text.isEmpty) Vector.empty
      else Vector(Token(text, 0))
    case Stop => letterRuns(text).zipWithIndex.collect {
      case (t, i) if !Analyzer.StopWords(t) => Token(t, i)
    }
    case English =>
      Analyzer.fastTokenize(text).map(t =>
        Token(PorterStemmer.stem(t.term), t.pos))
    case Folding => Analyzer.fastTokenize(foldToAscii(text))
    case k if stemChainOf(k).isDefined =>
      val (stops, pre, stem) = stemChainOf(k).get
      stopStemChain(text, stops, stem, pre)
    case CustomStops(stops, Stop) =>
      // StopAnalyzer(stopWords): letter runs with the REPLACED set
      letterRuns(text).zipWithIndex.collect {
        case (t, i) if !stops(t) => Token(t, i)
      }
    case CustomStops(stops, Pattern(sep, _)) =>
      tokenize(Pattern(sep, stops = false), text)
        .filter(t => !stops(t.term))
    case CustomStops(stops, Cjk) =>
      IntlAnalyzers.cjkBigrams(text).filter(t => !stops(t.term))
    case CustomStops(stops, inner) =>
      // remaining kinds: the listed terms are filtered OUT OF the
      // inner's output. For stop-free kinds (Whitespace, Simple,
      // Keyword) that is replacement; for derived-token kinds whose
      // tokenizer embeds the Standard set (Reversed, EdgeNgrams,
      // Shingles, Folding, Thai, Chinese, Decompound) it is
      // documented as FILTER-ON-TOP — the derived tokens (reversed
      // strings, n-grams, bigrams) are not the words a replacement set
      // names, so add-only is the semantically coherent reading
      tokenize(inner, text).filter(t => !stops(t.term))
    case StemAdjusted(inner, _, _) =>
      sys.error(s"StemAdjusted needs a stop+stem chain (or Standard), " +
        s"got $inner")
    case Cjk =>
      IntlAnalyzers.cjkBigrams(text).filter(t => !Analyzer.StopWords(t.term))
    case Chinese => IntlAnalyzers.chineseTokens(text)
    case Thai => IntlAnalyzers.thaiTokens(text)
    case Shingles(n, keepUnigrams) => shingles(text, n, keepUnigrams)
    case Decompound(dict, minWord, minSub, maxSub, longest) =>
      decompound(Analyzer.fastTokenize(text), dict, minWord, minSub,
        maxSub, longest)
    case hd: HyphenDecompound =>
      // the parsed pattern index is per-Kind state, not per-row work
      val hyph = hyphMemo.getOrElseUpdate(hd,
        new Hyphenator(hd.patterns, hd.exceptions))
      hyphenDecompound(Analyzer.fastTokenize(text), hyph, hd)
  }

  private val hyphMemo =
    new scala.collection.concurrent.TrieMap[Kind, Hyphenator]()

  /** The reference DecomposeInternal loop (HyphenationCompoundWord
    * TokenFilter.cs:161-230): original token always kept; for each
    * hyphenation point, candidate spans to every later point — longer
    * than maxSubword ends the round, shorter than minSubword is
    * skipped; a dictionary hit emits the span, otherwise the span
    * minus its LAST char is retried (genitive-s / binding chars);
    * onlyLongestMatch keeps one winner per start point. */
  def hyphenDecompound(toks: Vector[Token], hyph: Hyphenator,
      cfg: HyphenDecompound): Vector[Token] =
    toks.flatMap { t =>
      val out = Vector.newBuilder[Token]
      out += t
      val w = t.term
      val hyp: Vector[Int] =
        if (w.length >= cfg.minWordSize)
          hyph.hyphenate(w).getOrElse(Vector.empty)
        else Vector.empty
      var i = 0
      while (i < hyp.length) {
        val start = hyp(i)
        var bestLen = -1
        var j = 1
        var done = false
        while (!done && j < hyp.length - i) {
          val partLen = hyp(i + j) - start
          if (partLen > cfg.maxSubword) done = true
          else {
            if (partLen >= cfg.minSubword) {
              val part = w.substring(start, start + partLen)
              val hitLen =
                if (cfg.dict(part)) partLen
                else if (cfg.dict(part.dropRight(1))) partLen - 1
                else -1
              if (hitLen > 0) {
                if (cfg.onlyLongestMatch) {
                  if (hitLen > bestLen) bestLen = hitLen
                } else out += Token(w.substring(start, start + hitLen),
                  t.pos)
              }
            }
            j += 1
          }
        }
        if (cfg.onlyLongestMatch && bestLen > 0)
          out += Token(w.substring(start, start + bestLen), t.pos)
        i += 1
      }
      out.result()
    }

  /** Emit each token plus its dictionary subwords (all at the
    * compound's position — the reference keeps the original token
    * first, then matches by ascending start and length;
    * onlyLongestMatch keeps one longest subword per start). */
  def decompound(toks: Vector[Token], dict: Set[String],
      minWordSize: Int = 5, minSubword: Int = 2, maxSubword: Int = 15,
      onlyLongestMatch: Boolean = false): Vector[Token] =
    toks.flatMap { t =>
      val out = Vector.newBuilder[Token]
      out += t
      val w = t.term
      if (w.length >= minWordSize) {
        var i = 0
        while (i <= w.length - minSubword) {
          var best = -1
          var j = minSubword
          while (j <= maxSubword && i + j <= w.length) {
            if (dict(w.substring(i, i + j))) {
              if (onlyLongestMatch) best = j
              else out += Token(w.substring(i, i + j), t.pos)
            }
            j += 1
          }
          if (onlyLongestMatch && best > 0)
            out += Token(w.substring(i, i + best), t.pos)
          i += 1
        }
      }
      out.result()
    }

  /** Core of the reference's CZECH_STOP_WORDS (CzechAnalyzer.cs:49). */
  val CzechStopWords: Set[String] = Set(
    "a", "s", "k", "o", "i", "u", "v", "z", "dnes", "tímto", "budeš",
    "byli", "jseš", "můj", "ta", "tomto", "tohle", "tuto", "tyto",
    "jej", "zda", "proč", "máte", "tato", "kam", "tohoto", "kdo",
    "kteří", "mi", "nám", "tom", "tomuto", "mít", "nic", "proto",
    "kterou", "byla", "toho", "protože", "asi", "ho", "naši", "tím",
    "takže", "její", "jste", "tu", "tedy", "bylo", "kde", "ke", "ji",
    "nad", "nejsou", "či", "pod", "mezi", "přes", "ty", "pak", "vám",
    "ani", "když", "však", "jsem", "tento", "aby", "jsme", "před",
    "jejich", "byl", "ještě", "až", "bez", "také", "pouze", "první",
    "vaše", "která", "nás", "nový", "pokud", "může", "jeho", "své",
    "jiné", "není", "vás", "jen", "podle", "zde", "už", "být", "více",
    "bude", "již", "než", "který", "by", "které", "co", "nebo", "ten",
    "tak", "má", "při", "od", "po", "jsou", "jak", "další", "ale",
    "si", "se", "ve", "to", "jako", "za", "zpět", "ze", "do", "pro",
    "je", "na", "já", "on", "ona", "ono", "oni", "my", "vy")

  /** Greek stop set in GreekLowerCaseFilter-folded form (articles,
    * pronouns, particles — the GreekAnalyzer list's core). */
  val GreekStopWords: Set[String] = Set(
    "ο", "η", "το", "οι", "τα", "του", "της", "των", "τον", "την",
    "και", "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε",
    "στο", "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προς",
    "με", "σε", "ως", "παρα", "αντι", "κατα", "μετα", "θα", "να",
    "δε", "δεν", "μη", "μην", "επι", "ενω", "εαν", "αν", "τοτε",
    "που", "πως", "ποιος", "ποια", "ποιο", "ποιοι", "ποιες", "ποιων",
    "ποιους", "αυτος", "αυτη", "αυτο", "αυτοι", "αυτων", "αυτους",
    "αυτες", "αυτα", "εκεινος", "εκεινη", "εκεινο", "εκεινοι",
    "εκεινες", "εκεινα", "εκεινων", "εκεινους", "οπως", "ομως",
    "ισως", "οσο", "οτι")

  /** Core Persian stop set in normalized form (PersianAnalyzer's
    * default list core). */
  val PersianStopWords: Set[String] = Set(
    "و", "در", "به", "از", "که", "این", "را", "با", "های", "برای",
    "آن", "یک", "خود", "تا", "کرد", "بر", "هم", "نیز", "گفت", "شد",
    "دارد", "ما", "کند", "بود", "شده", "اما", "یا", "هر", "من", "او",
    "دو", "است", "هایی", "باید", "بین", "می", "اگر", "همه", "پس",
    "آنها")

  /** Core Arabic stop set (raw forms — the chain checks stops before
    * normalization, ArabicAnalyzer.cs order). */
  val ArabicStopWords: Set[String] = Set(
    "من", "إلى", "الى", "عن", "على", "في", "حتى", "إذا", "اذا",
    "أن", "ان", "إن", "كان", "كانت", "قد", "لم", "لن", "لو", "ما",
    "لا", "هذا", "هذه", "ذلك", "تلك", "هو", "هي", "هم", "كل", "بعض",
    "غير", "بين", "عند", "أو", "او", "ثم", "بعد", "قبل", "التي",
    "الذي", "الذين", "فيه", "فيها", "منه", "منها", "به", "بها", "له",
    "لها", "مع", "عليه", "عليها", "إلا", "الا", "أيضا", "ايضا",
    "كما", "لكن", "و")

  /** Core of the published Snowball Portuguese stop list (articles,
    * pronouns, prepositions + ser/estar/ter/haver high-frequency
    * forms). */
  val PortugueseStopWords: Set[String] = Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com",
    "não", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos",
    "como", "mas", "ao", "ele", "das", "à", "seu", "sua", "ou",
    "quando", "muito", "nos", "já", "eu", "também", "só", "pelo",
    "pela", "até", "isso", "ela", "entre", "depois", "sem", "mesmo",
    "aos", "seus", "quem", "nas", "me", "esse", "eles", "você", "essa",
    "num", "nem", "suas", "meu", "às", "minha", "numa", "pelos",
    "elas", "qual", "nós", "lhe", "deles", "essas", "esses", "pelas",
    "este", "dele", "tu", "te", "vocês", "vos", "lhes", "meus",
    "minhas", "teu", "tua", "teus", "tuas", "nosso", "nossa", "nossos",
    "nossas", "dela", "delas", "esta", "estes", "estas", "aquele",
    "aquela", "aqueles", "aquelas", "isto", "aquilo", "é", "são",
    "era", "foi", "ser", "está", "estão", "tem", "têm", "tinha",
    "foram", "há", "estou", "estava")

  /** The reference BR chain's own stop list
    * (BrazilianAnalyzer.cs:41-62) — NOTE it is written WITHOUT accents
    * ("nao", "entao", "apos"), so accented forms in text are NOT
    * stopped; they reach the stemmer, which folds them. Preserved
    * as-is, including the reference's "propios" typo. */
  val BrazilianStopWords: Set[String] = Set(
    "a", "ainda", "alem", "ambas", "ambos", "antes", "ao", "aonde",
    "aos", "apos", "aquele", "aqueles", "as", "assim", "com", "como",
    "contra", "contudo", "cuja", "cujas", "cujo", "cujos", "da",
    "das", "de", "dela", "dele", "deles", "demais", "depois", "desde",
    "desta", "deste", "dispoe", "dispoem", "diversa", "diversas",
    "diversos", "do", "dos", "durante", "e", "ela", "elas", "ele",
    "eles", "em", "entao", "entre", "essa", "essas", "esse", "esses",
    "esta", "estas", "este", "estes", "ha", "isso", "isto", "logo",
    "mais", "mas", "mediante", "menos", "mesma", "mesmas", "mesmo",
    "mesmos", "na", "nas", "nao", "nem", "nesse", "neste", "nos", "o",
    "os", "ou", "outra", "outras", "outro", "outros", "pelas", "pelo",
    "pelos", "perante", "pois", "por", "porque", "portanto",
    "proprio", "propios", "quais", "qual", "qualquer", "quando",
    "quanto", "que", "quem", "quer", "se", "seja", "sem", "sendo",
    "seu", "seus", "sob", "sobre", "sua", "suas", "tal", "tambem",
    "teu", "teus", "toda", "todas", "todo", "todos", "tua", "tuas",
    "tudo", "um", "uma", "umas", "uns")

  /** Core of the published Snowball Finnish stop list (pronouns,
    * olla/ei forms, conjunctions). */
  val FinnishStopWords: Set[String] = Set(
    "olla", "olen", "olet", "on", "olemme", "olette", "ovat", "ole",
    "oli", "olisi", "olisit", "olisin", "olisimme", "olisitte",
    "olisivat", "olit", "olin", "olimme", "olitte", "olivat", "ollut",
    "olleet", "en", "et", "ei", "emme", "ette", "eivät", "minä",
    "minun", "minut", "minua", "sinä", "sinun", "sinut", "sinua",
    "hän", "hänen", "hänet", "häntä", "me", "te", "he", "meidän",
    "teidän", "heidän", "tämä", "tuo", "se", "nämä", "nuo", "ne",
    "tässä", "tästä", "tähän", "tällä", "tämän", "siinä", "siitä",
    "siihen", "sillä", "sen", "joka", "jonka", "jota", "jossa",
    "josta", "johon", "jolla", "mikä", "minkä", "mitä", "missä",
    "mistä", "mihin", "millä", "kuka", "kenen", "ketä", "ja", "tai",
    "vai", "että", "mutta", "vaan", "kun", "niin", "kuin", "jos",
    "koska", "vaikka", "kanssa", "mukaan", "myös", "vielä", "jo",
    "nyt", "sitten", "kyllä", "juuri", "eli")

  /** The published Snowball Dutch stop list. */
  val DutchStopWords: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als",
    "voor", "had", "er", "maar", "om", "hem", "dan", "zou", "of",
    "wat", "mijn", "men", "dit", "zo", "door", "over", "ze", "zich",
    "bij", "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
    "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
    "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat", "iets",
    "worden", "toch", "al", "waren", "veel", "meer", "doen", "toen",
    "moet", "ben", "zonder", "kan", "hun", "dus", "alles", "onder",
    "ja", "eens", "hier", "wie", "werd", "altijd", "doch", "wordt",
    "wezen", "kunnen", "ons", "zelf", "tegen", "na", "reeds", "wil",
    "kon", "niets", "uw", "iemand", "geweest", "andere")

  /** The published Snowball Danish stop list. */
  val DanishStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som",
    "på", "de", "med", "han", "af", "for", "ikke", "der", "var", "mig",
    "sig", "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun",
    "nu", "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op",
    "man", "hans", "hvor", "eller", "hvad", "skal", "selv", "her",
    "alle", "vil", "blev", "kunne", "ind", "når", "være", "dog",
    "noget", "ville", "jo", "deres", "efter", "ned", "skulle", "denne",
    "end", "dette", "mit", "også", "under", "have", "dig", "anden",
    "hende", "mine", "alt", "meget", "sit", "sine", "vor", "mod",
    "disse", "hvis", "din", "nogle", "hos", "blive", "mange", "ad",
    "bliver", "hendes", "været", "thi", "jer", "sådan")

  /** Bokmål core of the published Snowball Norwegian stop list. */
  val NorwegianStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
    "som", "på", "de", "med", "han", "av", "ikke", "der", "så", "var",
    "meg", "seg", "men", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "nå", "over", "da", "ved", "fra", "du", "ut", "sin",
    "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller", "hva",
    "skal", "selv", "her", "alle", "vil", "bli", "ble", "blitt",
    "kunne", "inn", "når", "være", "kom", "noen", "noe", "ville",
    "dere", "deres", "kun", "ja", "etter", "ned", "skulle", "denne",
    "for", "deg", "si", "sine", "sitt", "mot", "å", "meget", "hvorfor",
    "dette", "disse", "uten", "hvordan", "ingen", "din", "ditt", "blir",
    "samme", "hvilken", "hvilke", "mellom", "vår", "hver", "hvem",
    "hvis", "både", "bare", "enn", "fordi", "før", "mange", "også",
    "slik", "vært", "begge", "siden")

  /** The published Snowball Swedish stop list. */
  val SwedishStopWords: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men", "ett",
    "om", "hade", "de", "av", "icke", "mig", "du", "henne", "då", "sin",
    "nu", "har", "inte", "hans", "honom", "skulle", "hennes", "där",
    "min", "man", "ej", "vid", "kunde", "något", "från", "ut", "när",
    "efter", "upp", "vi", "dem", "vara", "vad", "över", "än", "dig",
    "kan", "sina", "här", "ha", "mot", "alla", "under", "någon", "eller",
    "allt", "mycket", "sedan", "ju", "denna", "själv", "detta", "åt",
    "utan", "varit", "hur", "ingen", "mitt", "ni", "bli", "blev", "oss",
    "din", "dessa", "några", "deras", "blir", "mina", "samma", "vilken",
    "er", "sådan", "vår", "blivit", "dess", "inom", "mellan", "sådant",
    "varför", "varje", "vilka", "ditt", "vem", "vilket", "sitta",
    "sådana", "vart", "dina", "vars", "vårt", "våra", "ert", "era",
    "vilkas")

  /** Italian elision article set (the ElisionFilter set ItalianAnalyzer
    * uses in later Lucene — c/l/all/dall/dell/nell/sull/coll/pell/gl/
    * agl/dagl/degl/negl/sugl/un/m/t/s/v/d). */
  val ItalianElisionArticles: Set[String] = Set(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d")

  def elideIt(t: String): String = {
    val i = t.indexOf('\'')
    if (i > 0 && ItalianElisionArticles(t.substring(0, i)))
      t.substring(i + 1)
    else t
  }

  /** Core of the published Snowball Italian stop list (articles,
    * pronouns, prepositions + essere/avere high-frequency forms). */
  val ItalianStopWords: Set[String] = Set(
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli", "dall",
    "dagl", "dalla", "dalle", "di", "del", "dello", "dei", "degli",
    "dell", "degl", "della", "delle", "in", "nel", "nello", "nei",
    "negli", "nell", "negl", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sull", "sugl", "sulla", "sulle", "per", "tra",
    "contro", "io", "tu", "lui", "lei", "noi", "voi", "loro", "mio",
    "mia", "miei", "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua",
    "suoi", "sue", "nostro", "nostra", "nostri", "nostre", "vostro",
    "vostra", "vostri", "vostre", "mi", "ti", "ci", "vi", "lo", "la",
    "li", "le", "gli", "ne", "il", "un", "uno", "una", "ma", "ed",
    "se", "perché", "anche", "come", "dov", "dove", "che", "chi",
    "cui", "non", "più", "quale", "quanto", "quanti", "quanta",
    "quante", "quello", "quelli", "quella", "quelle", "questo",
    "questi", "questa", "queste", "si", "tutto", "tutti", "a", "c",
    "e", "i", "l", "o", "ho", "hai", "ha", "abbiamo", "avete", "hanno",
    "sono", "sei", "è", "siamo", "siete", "era", "erano", "essere",
    "stato", "stata")

  /** RussianAnalyzer.RUSSIAN_STOP_WORDS (RussianAnalyzer.cs:43-64). */
  val RussianStopWords: Set[String] = Set(
    "а", "без", "более", "бы", "был", "была", "были", "было", "быть",
    "в", "вам", "вас", "весь", "во", "вот", "все", "всего", "всех",
    "вы", "где", "да", "даже", "для", "до", "его", "ее", "ей", "ею",
    "если", "есть", "еще", "же", "за", "здесь", "и", "из", "или", "им",
    "их", "к", "как", "ко", "когда", "кто", "ли", "либо", "мне",
    "может", "мы", "на", "надо", "наш", "не", "него", "нее", "нет",
    "ни", "них", "но", "ну", "о", "об", "однако", "он", "она", "они",
    "оно", "от", "очень", "по", "под", "при", "с", "со", "так",
    "также", "такой", "там", "те", "тем", "то", "того", "тоже", "той",
    "только", "том", "ты", "у", "уже", "хотя", "чего", "чей", "чем",
    "что", "чтобы", "чье", "чья", "эта", "эти", "это", "я")

  /** Core of the published Snowball Spanish stop list (articles,
    * pronouns, common prepositions/conjunctions, ser/estar/haber
    * high-frequency forms). */
  val SpanishStopWords: Set[String] = Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    "esta", "entre", "cuando", "muy", "sin", "sobre", "también", "me",
    "hasta", "hay", "donde", "quien", "desde", "todo", "nos", "durante",
    "todos", "uno", "les", "ni", "contra", "otros", "ese", "eso",
    "ante", "ellos", "e", "esto", "mí", "antes", "algunos", "qué",
    "unos", "yo", "otro", "otras", "otra", "él", "tanto", "esa",
    "estos", "mucho", "quienes", "nada", "muchos", "cual", "poco",
    "ella", "estar", "estas", "algunas", "algo", "nosotros", "mi",
    "mis", "tú", "te", "ti", "tu", "tus", "es", "son", "está", "están",
    "fue", "ser", "ha", "han", "he", "era", "eran")

  /** ElisionFilter.cs:56 — strip a leading article + apostrophe
    * (l'avion → avion); the default French article set. */
  val ElisionArticles: Set[String] = Set("l", "m", "t", "qu", "n", "s", "j")

  def elide(t: String): String = {
    val i = t.indexOf('\'')
    if (i > 0 && ElisionArticles(t.substring(0, i))) t.substring(i + 1)
    else t
  }

  /** GermanAnalyzer.GERMAN_STOP_WORDS (GermanAnalyzer.cs:43). */
  val GermanStopWords: Set[String] = Set(
    "einer", "eine", "eines", "einem", "einen", "der", "die", "das",
    "dass", "daß", "du", "er", "sie", "es", "was", "wer", "wie", "wir",
    "und", "oder", "ohne", "mit", "am", "im", "in", "aus", "auf", "ist",
    "sein", "war", "wird", "ihr", "ihre", "ihres", "als", "für", "von",
    "dich", "dir", "mich", "mir", "mein", "kein", "durch", "wegen")

  /** FrenchAnalyzer.FRENCH_STOP_WORDS (FrenchAnalyzer.cs:64). */
  val FrenchStopWords: Set[String] = Set(
    "a", "afin", "ai", "ainsi", "après", "attendu", "au", "aujourd",
    "auquel", "aussi", "autre", "autres", "aux", "auxquelles", "auxquels",
    "avait", "avant", "avec", "avoir", "c", "car", "ce", "ceci", "cela",
    "celle", "celles", "celui", "cependant", "certain", "certaine",
    "certaines", "certains", "ces", "cet", "cette", "ceux", "chez", "ci",
    "combien", "comme", "comment", "concernant", "contre", "d", "dans",
    "de", "debout", "dedans", "dehors", "delà", "depuis", "derrière",
    "des", "désormais", "desquelles", "desquels", "dessous", "dessus",
    "devant", "devers", "devra", "divers", "diverse", "diverses", "doit",
    "donc", "dont", "du", "duquel", "durant", "dès", "elle", "elles",
    "en", "entre", "environ", "est", "et", "etc", "etre", "eu", "eux",
    "excepté", "hormis", "hors", "hélas", "hui", "il", "ils", "j", "je",
    "jusqu", "jusque", "l", "la", "laquelle", "le", "lequel", "les",
    "lesquelles", "lesquels", "leur", "leurs", "lorsque", "lui", "là",
    "ma", "mais", "malgré", "me", "merci", "mes", "mien", "mienne",
    "miennes", "miens", "moi", "moins", "mon", "moyennant", "même",
    "mêmes", "n", "ne", "ni", "non", "nos", "notre", "nous", "néanmoins",
    "nôtre", "nôtres", "on", "ont", "ou", "outre", "où", "par", "parmi",
    "partant", "pas", "passé", "pendant", "plein", "plus", "plusieurs",
    "pour", "pourquoi", "proche", "près", "puisque", "qu", "quand", "que",
    "quel", "quelle", "quelles", "quels", "qui", "quoi", "quoique",
    "revoici", "revoilà", "s", "sa", "sans", "sauf", "se", "selon",
    "seront", "ses", "si", "sien", "sienne", "siennes", "siens", "sinon",
    "soi", "soit", "son", "sont", "sous", "suivant", "sur", "ta", "te",
    "tes", "tien", "tienne", "tiennes", "tiens", "toi", "ton", "tous",
    "tout", "toute", "toutes", "tu", "un", "une", "va", "vers", "voici",
    "voilà", "vos", "votre", "vous", "vu", "vôtre", "vôtres", "y", "à",
    "ça", "ès", "été", "être", "ô")

  /** ShingleFilter analog (contrib Analyzers ShingleFilter): token
    * n-grams over the Standard chain's terms, joined with '_', emitted
    * at the position of their FIRST token; unigrams optionally kept
    * (outputUnigrams, the reference default). */
  def shingles(text: String, n: Int = 2,
      keepUnigrams: Boolean = true): Vector[Token] = {
    val base = Analyzer.fastTokenize(text)
    val grams = base.sliding(n).filter(_.size == n)
      .map(w => Token(w.map(_.term).mkString("_"), w.head.pos)).toVector
    if (keepUnigrams) (base ++ grams).sortBy(t => (t.pos, t.term.length))
    else grams
  }

  /** NGramTokenizer analog (contrib Analyzers NGram): all char n-grams
    * of each Standard-chain term for sizes in [minGram, maxGram],
    * emitted at the source token's position. */
  def charNGrams(text: String, minGram: Int = 2,
      maxGram: Int = 3): Vector[Token] =
    Analyzer.fastTokenize(text).flatMap { t =>
      for {
        size <- minGram to math.min(maxGram, t.term.length)
        i <- 0 to t.term.length - size
      } yield Token(t.term.substring(i, i + size), t.pos)
    }

  // ---- Classic/StandardTokenizer typed tokens ----

  /** StandardTokenizer token types
    * (/root/reference/src/core/Analysis/Standard/StandardTokenizer.cs:43-55:
    * ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM). COMPANY
    * (`AT&T`-style) and CJ are out of scope for the transcript corpus. */
  sealed trait TokenType
  case object Alphanum extends TokenType
  case object Apostrophe extends TokenType
  case object Acronym extends TokenType
  case object Email extends TokenType
  case object Host extends TokenType
  case object Num extends TokenType

  final case class TypedToken(term: String, pos: Int, tpe: TokenType)

  private val EmailRe = "[A-Za-z0-9_+.-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+"
  private val AcronymRe = "[A-Za-z](?:\\.[A-Za-z])+\\.?"
  private val HostNumRe = "[A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+"
  private val NumRe = "[A-Za-z0-9]+(?:[.,/_-][A-Za-z0-9]+)+"
  private val ApostRe = "[A-Za-z]+(?:'[A-Za-z]+)+"
  private val AlnumRe = "[A-Za-z0-9]+"
  // priority alternation — first match wins, longest-at-point semantics
  private val ClassicRe =
    s"(?:$EmailRe)|(?:$AcronymRe)|(?:$HostNumRe)|(?:$NumRe)|(?:$ApostRe)|(?:$AlnumRe)".r
  private val EmailFull = s"^$EmailRe$$".r
  private val AcronymFull = s"^$AcronymRe$$".r
  private val HostNumFull = s"^$HostNumRe$$".r
  private val NumFull = s"^$NumRe$$".r
  private val ApostFull = s"^$ApostRe$$".r

  /** The reference StandardTokenizer's typed scan (StandardTokenizer
    * grammar, StandardTokenizerImpl.cs:33-47): `bob@example.com` is ONE
    * EMAIL token, `www.example.com` one HOST, `u.s.a.` one ACRONYM,
    * `3.14`/`R2-D2` one NUM, `o'brien` one APOSTROPHE. Case preserved
    * (the LowerCaseFilter is a separate stage, as in the chain). */
  def classicTokenize(text: String): Vector[TypedToken] = {
    if (text == null) return Vector.empty
    ClassicRe.findAllIn(text).zipWithIndex.map { case (m, i) =>
      val tpe =
        if (EmailFull.findFirstIn(m).isDefined) Email
        else if (AcronymFull.findFirstIn(m).isDefined) Acronym
        else if (HostNumFull.findFirstIn(m).isDefined) {
          // an all-digit dotted run (3.14) is a NUM, not a HOST
          if (m.exists(Character.isLetter)) Host else Num
        } else if (NumFull.findFirstIn(m).isDefined) Num
        else if (ApostFull.findFirstIn(m).isDefined) Apostrophe
        else Alphanum
      TypedToken(m, i, tpe)
    }.toVector
  }

  /** Type-aware StandardFilter (StandardFilter.cs:23-60): strip dots
    * from ACRONYMs (`u.s.a.` → `usa`) and the trailing possessive from
    * APOSTROPHE tokens (`o'brien's` → `o'brien`); other types pass
    * through. */
  def classicFilter(t: TypedToken): TypedToken = t.tpe match {
    case Acronym => t.copy(term = t.term.replace(".", ""))
    case Apostrophe =>
      val lower = t.term
      if (lower.toLowerCase(java.util.Locale.ROOT).endsWith("'s"))
        t.copy(term = lower.substring(0, lower.length - 2))
      else t
    case _ => t
  }

  /** Full Classic chain: typed tokenizer → type-aware StandardFilter →
    * lowercase → stop/length — the reference's StandardAnalyzer with
    * token types intact (the default [[Analyzer]] chain is the scoped
    * word-break contract; this is the full-fidelity variant). */
  def classicChain(text: String): Vector[TypedToken] =
    classicTokenize(text).map(classicFilter)
      .map(t => t.copy(term = t.term.toLowerCase(java.util.Locale.ROOT)))
      .filter(t => t.term.nonEmpty && !Analyzer.StopWords(t.term) &&
        t.term.length <= Analyzer.MaxTokenLength)

  /** LengthFilter (LengthFilter.cs:27-43): drop tokens outside
    * [min, max] chars, positions preserved (no gap renumbering — the
    * reference increments positions only via StopFilter). */
  def lengthFilter(toks: Vector[Token], min: Int, max: Int): Vector[Token] =
    toks.filter(t => t.term.length >= min && t.term.length <= max)

  /** Maximal runs of letters, lowercased (LetterTokenizer + LowerCase). */
  private def letterRuns(text: String): Vector[String] = {
    if (text == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    text.foreach { c =>
      if (Character.isLetter(c)) sb.append(Character.toLowerCase(c))
      else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }

  /** ASCII folding with the reference table's full coverage
    * (ASCIIFoldingFilter.cs:58, 1,242 mappings) — but DERIVED, not
    * ported: the fold for each BMP char is computed once at class init
    * from Unicode data the JDK already carries. Three derivation layers:
    *
    *  1. NFKD-decompose + strip combining marks (covers every accented
    *     Latin letter, ligatures ﬁ→fi, fullwidth Ａ→A, circled ⓐ→a,
    *     parenthesized ⒜→(a), super/subscripts).
    *  2. Unicode-NAME grammar for the non-decomposable Latin letters:
    *     "LATIN <case> LETTER <modifiers> <BASE> [WITH …]" folds to
    *     BASE in the named case ("SMALL CAPITAL" → capital, as the
    *     reference does); named letters (SCHWA→A, ETH→D, THORN→TH,
    *     IOTA→I, HWAIR→HV, YOGH→Z, KRA→Q…) and digraphs (DB/DZ/LS/LZ)
    *     resolve the same way. Dingbat/negative-circled digit names
    *     ("… DIGIT FOUR", "… NUMBER ELEVEN") fold to the digits.
    *  3. Punctuation by name keyword: QUOTATION MARK / PRIME → " or '
    *     (SINGLE → '), HYPHEN/…DASH → -, bracket/parenthesis/ornament
    *     names → [ ] ( ) < > { }, plus the handful of literal folds
    *     (LOW ASTERISK→*, FRACTION SLASH→/, SWUNG DASH→~, CARET→^,
    *     REVERSED SEMICOLON→;, COMMERCIAL MINUS→%).
    *
    * Verified against the reference's own generated all-foldings corpus
    * shape (TestASCIIFoldingFilter.cs:169): 1,230 of its 1,242 cases
    * fold identically; the 12-case residue is the reference's
    * case-inversion oddities (e.g. CAPITAL TURNED A → 'a', INSULAR S
    * swapped) and LONG S WITH DOT ABOVE → 'f', which we fold to the
    * linguistically regular case/letter instead — documented
    * deviation. */
  def foldToAscii(text: String): String = {
    if (text == null) return null
    val nfkd = Normalizer.normalize(text, Normalizer.Form.NFKD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    val sb = new StringBuilder(nfkd.length)
    nfkd.foreach { c =>
      if (c < 0x80) sb.append(c)
      else sb.append(FoldTable.getOrElse(c, c.toString))
    }
    sb.toString
  }

  private val FoldNamed = Map(
    "SCHWA" -> "A", "ETH" -> "D", "IOTA" -> "I", "HWAIR" -> "HV",
    "ESH" -> "S", "EZH" -> "Z", "YOGH" -> "Z", "WYNN" -> "W",
    "THORN" -> "TH", "ENG" -> "N", "KRA" -> "Q", "VEND" -> "V",
    "SHARP S" -> "SS")
  private val FoldMods = Set(
    "TURNED", "REVERSED", "INVERTED", "SCRIPT", "BROKEN", "INSULAR",
    "VOLAPUK", "STRETCHED", "CLOSED", "OPEN", "AFRICAN", "HALF",
    "BARRED", "SIDEWAYS", "CROSSED", "EPIGRAPHIC", "MIDDLE-WELSH",
    "VISIGOTHIC", "LONG", "GLOTTAL", "DOTLESS", "FLATTENED",
    "ROTUNDA", "ARCHAIC", "TOP", "BOTTOM")
  private val FoldWords = Map(
    "ZERO" -> "0", "ONE" -> "1", "TWO" -> "2", "THREE" -> "3",
    "FOUR" -> "4", "FIVE" -> "5", "SIX" -> "6", "SEVEN" -> "7",
    "EIGHT" -> "8", "NINE" -> "9", "TEN" -> "10", "ELEVEN" -> "11",
    "TWELVE" -> "12", "THIRTEEN" -> "13", "FOURTEEN" -> "14",
    "FIFTEEN" -> "15", "SIXTEEN" -> "16", "SEVENTEEN" -> "17",
    "EIGHTEEN" -> "18", "NINETEEN" -> "19", "TWENTY" -> "20")
  private val FoldLiteral = Map(
    '⁎' -> "*", '⁏' -> ";", '‸' -> "^", '⁄' -> "/",
    '⁒' -> "%", '⁓' -> "~")

  private def deriveFold(c: Char): Option[String] = {
    val name = Character.getName(c.toInt)
    if (name == null) return None
    if (FoldLiteral.contains(c)) return FoldLiteral.get(c)
    if (name.startsWith("LATIN ")) {
      val stripped = name.drop(6)
        .replaceAll(" (WITH|AND|PRECEDED BY) .*$", "")
        .replaceAll(" (BAR|TAIL|TILDE|HOOK|STROKE|CURL|BELT|LONGA)$", "")
      val words = stripped.split(' ').toSeq
        .filterNot(w => w == "LETTER" || w == "LIGATURE")
      // "SMALL CAPITAL X" folds UP, so CAPITAL anywhere wins the case
      val upper = words.contains("CAPITAL")
      val digraph = words.contains("DIGRAPH")
      val toks = words.filterNot(w =>
        Set("SMALL", "CAPITAL", "SUBSCRIPT", "MODIFIER", "DIGRAPH")(w) ||
          FoldMods(w))
      val base = FoldNamed.getOrElse(toks.mkString(" "),
        if (toks.size == 1) toks.head else return None)
      if (!(base.length <= 2 && base.forall(_.isLetter))) return None
      return Some(
        if (digraph) base.toLowerCase
        else if (upper) base else base.toLowerCase)
    }
    // NFKD turns super/subscript minus into U+2212 MINUS SIGN; fold both
    if (name.endsWith("MINUS") || name == "MINUS SIGN") return Some("-")
    // dingbat / negative-circled digits and numbers (the decomposable
    // ones never reach here — NFKD already folded them)
    val numM = "^.*(?:DIGIT|NUMBER) ([A-Z]+)$".r
    name match {
      case numM(w) if FoldWords.contains(w) => return FoldWords.get(w)
      case _ =>
    }
    if (name.contains("QUOTATION MARK") || name.contains("PRIME"))
      return Some(if (name.contains("SINGLE")) "'"
        else if (name.contains("DOUBLE")) "\""
        else if (name.contains("PRIME")) "'"
        else "\"")
    if (name.contains("HYPHEN") || name.endsWith("DASH")) return Some("-")
    def side(l: String, r: String) =
      if (name.contains("LEFT")) Some(l)
      else if (name.contains("RIGHT")) Some(r) else None
    if (name.contains("DOUBLE PARENTHESIS")) return side("((", "))")
    if (name.contains("PARENTHESIS")) return side("(", ")")
    if (name.contains("SQUARE BRACKET") ||
      name.contains("TORTOISE SHELL BRACKET")) return side("[", "]")
    if (name.contains("ANGLE BRACKET")) return side("<", ">")
    if (name.contains("CURLY BRACKET")) return side("{", "}")
    None
  }

  /** Lazy one-time fold table over the BMP (chars ≥ 0x80 only; ASCII
    * passes through untouched). ~65k name lookups once per JVM. */
  private lazy val FoldTable: Map[Char, String] = {
    val b = Map.newBuilder[Char, String]
    var c = 0x80
    while (c <= 0xFFFF) {
      val ch = c.toChar
      if (!Character.isSurrogate(ch)) {
        val nfkd = Normalizer.normalize(ch.toString, Normalizer.Form.NFKD)
          .filterNot(x => Character.getType(x) == Character.NON_SPACING_MARK)
        if (nfkd.nonEmpty && nfkd.forall(_ < 0x80)) b += ch -> nfkd
        else deriveFold(ch).foreach(f => b += ch -> f)
      }
      c += 1
    }
    b.result()
  }

  /** MappingCharFilter analog (MappingCharFilter.cs, BaseCharFilter.cs):
    * greedy longest-match char-sequence rewriting applied BEFORE the
    * tokenizer. */
  def mapChars(mappings: Map[String, String])(text: String): String =
    mapCharsWithOffsets(mappings)(text)._1

  /** Mapping char filter WITH offset correction
    * (BaseCharFilter.CorrectOffset, BaseCharFilter.cs:28-61): returns
    * (filtered text, correct) where correct(offset-in-filtered) = the
    * offset in the ORIGINAL input — what highlighters need to place
    * snippets on raw text after char filtering. Checkpoint pairs
    * (filteredPos, cumulativeDelta) are recorded at each replacement
    * end, exactly the reference's AddOffCorrectMap arrays. */
  def mapCharsWithOffsets(mappings: Map[String, String])(
      text: String): (String, Int => Int) = {
    if (text == null || mappings.isEmpty) return (text, identity)
    val keys = mappings.keys.toSeq.sortBy(-_.length)
    val sb = new StringBuilder
    // parallel arrays: filtered position -> cumulative (orig - filtered)
    val cps = scala.collection.mutable.ArrayBuffer[(Int, Int)]((0, 0))
    var i = 0
    while (i < text.length) {
      keys.find(k => text.startsWith(k, i)) match {
        case Some(k) =>
          sb.append(mappings(k)); i += k.length
          cps += ((sb.length, i - sb.length))
        case None => sb.append(text.charAt(i)); i += 1
      }
    }
    val arr = cps.toArray
    val correct = (off: Int) => {
      // last checkpoint at or before off (arrays are ascending)
      var lo = 0; var hi = arr.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (arr(mid)._1 <= off) lo = mid else hi = mid - 1
      }
      off + arr(lo)._2
    }
    (sb.toString, correct)
  }
}
