package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** StandardAnalyzer-equivalent analysis chain as pure functions + Catalyst
  * column expressions (no UDFs — stays inside whole-stage codegen).
  *
  * Contract (reference: /root/reference/src/core/Analysis/Standard/
  * StandardAnalyzer.cs:107-115 — StandardTokenizer → StandardFilter →
  * LowerCaseFilter → StopFilter):
  *   1. lowercase the input (LowerCaseFilter.cs:49)
  *   2. word-break on non-alphanumerics; apostrophes are kept inside a word
  *      (StandardTokenizer APOSTROPHE type, StandardTokenizer.cs:65-81)
  *   3. strip a trailing `'s` possessive (StandardFilter.cs)
  *   4. drop the 33-word English stop set (StopAnalyzer.cs:134-139) while
  *      preserving position increments (StopFilter.cs:52) — i.e. a kept
  *      token's position is its index in the pre-stop token sequence
  *   5. discard tokens longer than 255 chars (StandardAnalyzer.cs:124)
  *
  * The same chain exists three times, proven equivalent by property
  * tests:
  *  - [[tokenize]]: regex-based pure Scala (the readable reference form)
  *  - [[fastTokenize]]: hand-rolled scanner — what the distributed index
  *    build runs inside its partition-local inversion (mapPartitions;
  *    a Generator-shaped expression can't host the per-doc hash inversion)
  *  - [[rawTokensCol]] / token filters: Catalyst-expression twin for
  *    plans that want tokens as a column (codegen'd, no boxing).
  */
object Analyzer {

  /** StopAnalyzer.ENGLISH_STOP_WORDS_SET — reference
    * src/core/Analysis/StopAnalyzer.cs:134-139 (33 words). */
  val StopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  val StopWordsSeq: Seq[String] = StopWords.toSeq.sorted

  /** StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH (StandardAnalyzer.cs:124). */
  val MaxTokenLength = 255

  /** Word pattern over lowercased text: runs of letters/digits, with
    * interior apostrophes (o'brien). Java regex (Spark); the DuckDB oracle
    * uses the ASCII-equivalent form — identical on ASCII input. */
  val TokenPattern = "[\\p{L}\\p{N}]+(?:'[\\p{L}\\p{N}]+)*"

  private val TokenRe = TokenPattern.r

  final case class Token(term: String, pos: Int)

  /** Possessive strip per StandardFilter. */
  @inline def stripPossessive(t: String): String =
    if (t.endsWith("'s")) t.substring(0, t.length - 2) else t

  /** Raw token terms (lowercased, possessive-stripped), before stop/length
    * filtering — position i in this sequence is the Lucene position. */
  def rawTokens(text: String): Vector[String] =
    if (text == null) Vector.empty
    else TokenRe.findAllIn(text.toLowerCase(java.util.Locale.ROOT))
      .map(stripPossessive).toVector

  /** Full chain: kept tokens with stop-gap-preserving positions. */
  def tokenize(text: String): Vector[Token] =
    rawTokens(text).iterator.zipWithIndex.collect {
      case (t, i) if !StopWords(t) && t.nonEmpty && t.length <= MaxTokenLength =>
        Token(t, i)
    }.toVector

  /** True iff cp belongs to the tokenizer's word alphabet — exactly the
    * regex classes \p{L}\p{N} (letters + all Unicode number categories,
    * not just decimal digits). */
  @inline private def isWordCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** Hand-rolled scanner equal to [[tokenize]] (property-tested): the
    * regex engine dominates index-build CPU, this is the hot path the
    * distributed build uses. Single forward pass over the lowercased
    * text; interior apostrophes join word runs; trailing 's stripped. */
  def fastTokenize(text: String): scala.collection.immutable.Vector[Token] = {
    if (text == null) return Vector.empty
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    val out = Vector.newBuilder[Token]
    var i = 0
    var pos = 0
    while (i < n) {
      val c0 = s.codePointAt(i)
      if (isWordCp(c0)) {
        val start = i
        var end = i
        var j = i
        while (j < n && {
          val cp = s.codePointAt(j)
          if (isWordCp(cp)) { j += Character.charCount(cp); end = j; true }
          else if (cp == '\'' && j + 1 < n && isWordCp(s.codePointAt(j + 1))) {
            // interior apostrophe continues the word
            j += 1; true
          } else false
        }) ()
        var t = s.substring(start, end)
        if (t.endsWith("'s")) t = t.substring(0, t.length - 2)
        if (!StopWords(t) && t.nonEmpty && t.length <= MaxTokenLength)
          out += Token(t, pos)
        pos += 1
        i = end
      } else i += Character.charCount(c0)
    }
    out.result()
  }

  // ---------------------------------------------------------------------
  // Catalyst-expression variant (used by the distributed build; codegen'd)
  // ---------------------------------------------------------------------

  /** array<string> of raw tokens (lowercased, possessive-stripped). */
  def rawTokensCol(text: Column): Column =
    transform(
      regexp_extract_all(lower(text), lit(TokenPattern), lit(0)),
      t => regexp_replace(t, lit("'s$"), lit("")))

  /** Keep-predicate matching tokenize()'s stop/length filter. */
  def keepTokenCol(term: Column): Column =
    !term.isin(StopWordsSeq: _*) && length(term) <= MaxTokenLength &&
      length(term) > 0

  /** Analyze a *query* string into its term sequence (what QueryParser
    * feeds through the analyzer, reference QueryParser.cs:500). */
  def analyzeQuery(text: String): Vector[String] = tokenize(text).map(_.term)
}
