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
  /** FrenchAnalyzer.cs:46 analog: Standard tokens → elision (l'avion →
    * avion, ElisionFilter.cs:56 default article set) → French stop
    * set → Snowball French stemmer. */
  case object French extends Kind

  def tokenize(kind: Kind, text: String): Vector[Token] = kind match {
    case Standard => Analyzer.fastTokenize(text)
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
    case German =>
      // raw (pre-English-stop) tokens with positional gaps for the
      // German stop set, then stem — position = raw-token index, the
      // same coordinate system as the Standard chain
      Analyzer.rawTokens(text).zipWithIndex.collect {
        case (t, i) if t.nonEmpty && !GermanStopWords(t) &&
            t.length <= Analyzer.MaxTokenLength =>
          Token(GermanStemmer.stem(t), i)
      }
    case French =>
      Analyzer.rawTokens(text).iterator.map(elide).zipWithIndex.collect {
        case (t, i) if t.nonEmpty && !FrenchStopWords(t) &&
            t.length <= Analyzer.MaxTokenLength =>
          Token(FrenchStemmer.stem(t), i)
      }.toVector
  }

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

  /** ASCII folding: NFD-decompose and strip combining marks, plus the
    * common non-decomposable Latin special cases the reference's table
    * covers (ASCIIFoldingFilter.cs:58 — ours is the Unicode-normalizer
    * formulation of the same fold, not a port of its switch table). */
  def foldToAscii(text: String): String = {
    if (text == null) return null
    val special = Map(
      'ß' -> "ss", 'æ' -> "ae", 'Æ' -> "AE", 'ø' -> "o", 'Ø' -> "O",
      'đ' -> "d", 'Đ' -> "D", 'þ' -> "th", 'Þ' -> "TH", 'ð' -> "d",
      'Ð' -> "D", 'œ' -> "oe", 'Œ' -> "OE", 'ł' -> "l", 'Ł' -> "L",
      'ħ' -> "h", 'Ħ' -> "H", 'ŧ' -> "t", 'Ŧ' -> "T", 'ı' -> "i")
    val pre = text.flatMap(c => special.getOrElse(c, c.toString))
    Normalizer.normalize(pre, Normalizer.Form.NFD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
  }

  /** MappingCharFilter analog (MappingCharFilter.cs, BaseCharFilter.cs):
    * greedy longest-match char-sequence rewriting applied BEFORE the
    * tokenizer. Offset correction is intentionally absent — the engine
    * tracks token positions, not char offsets (documented deviation). */
  def mapChars(mappings: Map[String, String])(text: String): String = {
    if (text == null || mappings.isEmpty) return text
    val keys = mappings.keys.toSeq.sortBy(-_.length)
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      keys.find(k => text.startsWith(k, i)) match {
        case Some(k) => sb.append(mappings(k)); i += k.length
        case None => sb.append(text.charAt(i)); i += 1
      }
    }
    sb.toString
  }
}
