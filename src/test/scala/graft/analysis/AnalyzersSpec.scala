package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer.Token

/** Analyzer-variant suite: Porter golden vectors are the worked examples
  * published in Porter 1980 ("An algorithm for suffix stripping") — the
  * same vectors the reference's PorterStemFilter is built to satisfy. */
class AnalyzersSpec extends AnyFunSuite {

  test("Porter stemmer matches the published worked examples") {
    val vectors = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val bad = vectors.collect {
      case (w, want) if PorterStemmer.stem(w) != want =>
        s"$w -> ${PorterStemmer.stem(w)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("analyzer variants") {
    import Analyzers._
    val s = "The QUICK-Brown foxes' jump2day"
    assert(tokenize(Whitespace, s).map(_.term) ==
      Vector("The", "QUICK-Brown", "foxes'", "jump2day"))
    assert(tokenize(Simple, s).map(_.term) ==
      Vector("the", "quick", "brown", "foxes", "jump", "day"))
    assert(tokenize(Keyword, s) == Vector(Token(s, 0)))
    // stop: same letter runs minus stopwords, positions preserved
    assert(tokenize(Stop, s).map(t => (t.term, t.pos)) ==
      Vector(("quick", 1), ("brown", 2), ("foxes", 3), ("jump", 4),
        ("day", 5)))
    // english: standard chain + porter
    assert(tokenize(English, "motoring conflated tables").map(_.term) ==
      Vector("motor", "conflat", "tabl"))
    // folding feeds the standard chain
    assert(tokenize(Folding, "Crème BRÛLÉE façade").map(_.term) ==
      Vector("creme", "brulee", "facade"))
  }

  test("shingles and char n-grams") {
    // "spark table merge" -> bigram shingles at first-token positions
    val sh = Analyzers.shingles("spark table merge", 2, keepUnigrams = false)
    assert(sh.map(t => (t.term, t.pos)) ==
      Vector(("spark_table", 0), ("table_merge", 1)))
    val withUni = Analyzers.shingles("spark table", 2)
    assert(withUni.map(_.term) == Vector("spark", "spark_table", "table"))
    val ng = Analyzers.charNGrams("fox", 2, 3)
    assert(ng.map(_.term) == Vector("fo", "ox", "fox"))
    assert(ng.forall(_.pos == 0))
  }

  test("ascii folding handles specials and combining marks") {
    assert(Analyzers.foldToAscii("straße œuvre Łódź") == "strasse oeuvre Lodz")
    assert(Analyzers.foldToAscii("naïve élan") == "naive elan")
  }

  test("ascii folding matches the reference Latin1 accent vector") {
    // TestASCIIFoldingFilter.cs:32 TestLatin1Accents, token for token
    val in = "Des mot clés À LA CHAÎNE À Á Â Ã Ä Å Æ Ç È É Ê Ë Ì Í Î Ï Ĳ Ð Ñ" +
      " Ò Ó Ô Õ Ö Ø Œ Þ Ù Ú Û Ü Ý Ÿ à á â ã ä å æ ç è é ê ë ì í î ï ĳ" +
      " ð ñ ò ó ô õ ö ø œ ß þ ù ú û ü ý ÿ ﬁ ﬂ"
    val expect = ("Des mot cles A LA CHAINE A A A A A A AE C E E E E I I I I" +
      " IJ D N O O O O O O OE TH U U U U Y Y a a a a a a ae c e e e e" +
      " i i i i ij d n o o o o o o oe ss th u u u u y y fi fl").split(' ')
    assert(Analyzers.foldToAscii(in).split(' ').toSeq == expect.toSeq)
  }

  test("ascii folding covers the non-decomposable table regions") {
    // samples across the reference's full switch table
    // (ASCIIFoldingFilter.cs:58): hook/stroke letters, small capitals,
    // named letters, digraphs, dingbat digits, quotes/dashes/brackets
    val cases = Seq(
      "Ɓ" -> "B", "ƀ" -> "b",       // hook / stroke
      "ᴀ" -> "A", "ʙ" -> "B",       // small capitals fold UP
      "Ə" -> "A", "ə" -> "a",       // schwa
      "Ð" -> "D", "ð" -> "d",       // eth
      "Ŋ" -> "N", "ŋ" -> "n",       // eng
      "ĸ" -> "q",                    // kra
      "Ǖ" -> "U", "ǘ" -> "u",       // double-diacritic (NFKD path)
      "ȸ" -> "db", "ʣ" -> "dz",     // digraphs
      "❾" -> "9", "➓" -> "10",     // dingbat negative circled
      "“" -> "\"", "”" -> "\"", "‘" -> "'", "’" -> "'",
      "«" -> "\"", "»" -> "\"", "‹" -> "'", "›" -> "'",
      "–" -> "-", "—" -> "-", "⁻" -> "-",
      "⁅" -> "[", "⁆" -> "]", "❪" -> "(", "❫" -> ")",
      "❬" -> "<", "❭" -> ">", "❴" -> "{", "❵" -> "}",
      "⁎" -> "*", "⁄" -> "/", "⁓" -> "~",
      "Ⓐ" -> "A", "ⓩ" -> "z", "Ａ" -> "A", "ｚ" -> "z")
    cases.foreach { case (in, out) =>
      assert(Analyzers.foldToAscii(in) == out,
        s"fold($in, U+${in.codePointAt(0).toHexString}) != $out " +
          s"(got ${Analyzers.foldToAscii(in)})")
    }
  }

  test("mapping char filter rewrites longest match first") {
    val f = Analyzers.mapChars(
      Map("ph" -> "f", "pha" -> "fa~", "&" -> " and ")) _
    assert(f("alpha & phone") == "alfa~  and  fone")
  }

  test("mapping char filter corrects offsets back to the original") {
    val (out, correct) =
      Analyzers.mapCharsWithOffsets(Map("&" -> "and", "ß" -> "ss"))(
        "a & straße end")
    assert(out == "a and strasse end")
    // filtered "and" starts at 2 == the original '&' at 2
    assert(correct(2) == 2)
    // after "&"->"and" the stream is 2 chars longer: filtered
    // "strasse" at 6 maps back to original "straße" at 4
    assert(correct(6) == 4)
    // after both replacements (cumulative delta -3): filtered "end"
    // at 14 maps back to original "end" at 11
    assert(correct(14) == 11)
    assert(correct(0) == 0)
  }

  test("classic tokenizer types: email, host, acronym, num, apostrophe") {
    import Analyzers._
    val toks = classicTokenize(
      "Mail bob@Example.COM or visit www.example.com; U.S.A. has 3.14 " +
        "R2-D2 and O'Brien's book")
    val byTerm = toks.map(t => t.term -> t.tpe).toMap
    assert(byTerm("bob@Example.COM") == Email)
    assert(byTerm("www.example.com") == Host)
    assert(byTerm("U.S.A.") == Acronym)
    assert(byTerm("3.14") == Num)   // all-digit dotted run is NUM not HOST
    assert(byTerm("R2-D2") == Num)
    assert(byTerm("O'Brien's") == Apostrophe)
    assert(byTerm("Mail") == Alphanum)
    // positions are the scan order
    assert(toks.map(_.pos) == toks.indices.toVector)

    // type-aware StandardFilter + full chain
    val chain = classicChain("U.S.A. mailed O'Brien's file to bob@x.org")
    assert(chain.map(_.term) ==
      Vector("usa", "mailed", "o'brien", "file", "bob@x.org"))
  }

  test("dictionary decompounder: subwords at the compound's position") {
    import graft.analysis.Analyzer.Token
    val dict = Set("rind", "fleisch", "schiff", "fahrt", "dampf")
    val toks = Analyzers.tokenize(
      Analyzers.Decompound(dict),
      "the rindfleisch and dampfschiffahrt")
    assert(toks == Vector(
      Token("rindfleisch", 1), Token("rind", 1), Token("fleisch", 1),
      Token("dampfschiffahrt", 3), Token("dampf", 3),
      Token("schiff", 3), Token("fahrt", 3)))
    // below minWordSize: the token passes through undecomposed
    assert(Analyzers.tokenize(Analyzers.Decompound(dict), "rind") ==
      Vector(Token("rind", 0)))
    // onlyLongestMatch keeps one longest subword per start
    val d2 = dict + "schiffahrt"
    val longest = Analyzers.tokenize(
      Analyzers.Decompound(d2, onlyLongestMatch = true), "dampfschiffahrt")
    assert(longest == Vector(Token("dampfschiffahrt", 0),
      Token("dampf", 0), Token("schiffahrt", 0), Token("fahrt", 0)))
  }

  test("reversed / edge-ngram / pattern kinds") {
    import graft.analysis.Analyzer.Token
    // Reversed: kept Standard tokens, each reversed, positions intact
    assert(Analyzers.tokenize(Analyzers.Reversed, "the customer filter") ==
      Vector(Token("remotsuc", 1), Token("retlif", 2)))
    // EdgeNgrams: minGram..maxGram prefixes, all at the token position
    assert(Analyzers.tokenize(Analyzers.EdgeNgrams(2, 4), "spark it") ==
      Vector(Token("sp", 0), Token("spa", 0), Token("spar", 0)))
    // a token shorter than maxGram stops at its own length
    assert(Analyzers.tokenize(Analyzers.EdgeNgrams(1, 8), "row") ==
      Vector(Token("r", 0), Token("ro", 0), Token("row", 0)))
    // Pattern: the regex is the SEPARATOR; lowercase; empty fields and
    // stopwords drop; positions are field indices
    assert(Analyzers.tokenize(Analyzers.Pattern(","), "X,,The,B") ==
      Vector(Token("x", 0), Token("b", 3)))
    assert(Analyzers.tokenize(Analyzers.Pattern(",", stops = false),
      "X,,the,B") == Vector(Token("x", 0), Token("the", 2), Token("b", 3)))
  }

  test("stem-adjusted chain: overrides and exclusions intercept the stemmer") {
    import graft.analysis.Analyzer.Token
    // exclusion passes through unstemmed; override wins over the stemmer
    val k = Analyzers.StemAdjusted(Analyzers.German,
      overrides = Map("tische" -> "fixedstem"),
      exclusions = Set("tischen"))
    assert(Analyzers.tokenize(k, "tische tischen häuser") ==
      Vector(Token("fixedstem", 0), Token("tischen", 1), Token("haus", 2)))
    // unadjusted chain for comparison
    assert(Analyzers.tokenize(Analyzers.German, "tische tischen") ==
      Vector(Token("tisch", 0), Token("tisch", 1)))
  }

  test("Dutch stem-dictionary override matches the reference fixture") {
    // EXTERNAL fixture: test/contrib/Analyzers/Nl/customStemDict.txt
    // (DutchAnalyzer.SetStemDictionary) — tab-separated word/stem pairs
    val p = java.nio.file.Paths.get(
      "/root/reference/test/contrib/Analyzers/Nl/customStemDict.txt")
    assume(java.nio.file.Files.exists(p))
    val dict = WordLists.stemDict(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    assert(dict.size == 3)
    val k = Analyzers.StemAdjusted(Analyzers.Dutch, overrides = dict)
    for ((w, s) <- dict)
      assert(Analyzers.tokenize(k, w) == Vector(Token(s, 0)),
        s"$w should map to $s")
  }

  test("custom stop set replaces a chain's own; filters other kinds") {
    import graft.analysis.Analyzer.Token
    // EXTERNAL fixture: the Czech custom stop-word file (WordlistLoader
    // shape) REPLACES the Czech chain's stop set — "republika" becomes
    // a stop word, while default Czech stops (e.g. "je") pass through
    val p = java.nio.file.Paths.get(
      "/root/reference/test/contrib/Analyzers/Cz/customStopWordFile.txt")
    assume(java.nio.file.Files.exists(p))
    val stops = WordLists.wordSet(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    assert(stops == Set("examplestopword", "anotherexamplestopword",
      "republika"))
    val k = Analyzers.CustomStops(stops, Analyzers.Czech)
    assert(Analyzers.tokenize(k, "je republika demokracie") ==
      Vector(Token("je", 0), Token("demokracie", 2)))
    assert(Analyzers.tokenize(Analyzers.Czech, "je republika") ==
      Vector(Token("republika", 1))) // unmodified chain for contrast
    // Standard inner: the custom set REPLACES the default 33-word
    // English set (StandardAnalyzer(stopWords) semantics) — "the" is
    // KEPT because it is not in the replacement set
    assert(Analyzers.tokenize(
      Analyzers.CustomStops(Set("spark"), Analyzers.Standard),
      "the spark row") == Vector(Token("the", 0), Token("row", 2)))
    // Stop inner: letter runs with the replaced set
    assert(Analyzers.tokenize(
      Analyzers.CustomStops(Set("fox"), Analyzers.Stop),
      "the fox runs") == Vector(Token("the", 0), Token("runs", 2)))
  }

  test("positioned kind: fixed increment after the first token") {
    import graft.analysis.Analyzer.Token
    // increment 0: the whole stream stacks on the first kept position
    // (note "the" is stopped at pos 0, so the chain starts at pos 1)
    assert(Analyzers.tokenize(Analyzers.Positioned(0),
      "the customer filter row") ==
      Vector(Token("customer", 1), Token("filter", 1), Token("row", 1)))
    // increment 2: spaced from the first token's position
    assert(Analyzers.tokenize(Analyzers.Positioned(2), "spark line row") ==
      Vector(Token("spark", 0), Token("line", 2), Token("row", 4)))
    // wraps any inner kind
    assert(Analyzers.tokenize(
      Analyzers.Positioned(0, Analyzers.Whitespace), "A B") ==
      Vector(Token("A", 0), Token("B", 0)))
    assert(Analyzers.tokenize(Analyzers.Positioned(0), "") == Vector.empty)
  }

  test("length filter min and max") {
    import graft.analysis.Analyzer.Token
    val toks = Vector(Token("a", 0), Token("spark", 1), Token("hi", 2),
      Token("extraordinarily", 3))
    assert(Analyzers.lengthFilter(toks, 2, 10).map(_.term) ==
      Vector("spark", "hi"))
    // positions preserved, not renumbered
    assert(Analyzers.lengthFilter(toks, 2, 10).map(_.pos) == Vector(1, 2))
  }

  test("tee sinks: one analysis, date / range / type views") {
    import SinkFilters._
    val text = "meeting 2025-01-02 bob@example.com 3.14 u.s.a. " +
      "rescheduled 2025-02-03"
    // surviving classic-chain tokens (none are stopwords), ordinals:
    // 0 meeting ALPHANUM, 1 2025-01-02 NUM, 2 bob@example.com EMAIL,
    // 3 3.14 NUM, 4 usa ACRONYM (dots stripped), 5 rescheduled,
    // 6 2025-02-03 NUM
    val out = tee(text, Seq(
      "dates" -> DateSink(),
      "first3" -> TokenRangeSink(0, 3),
      "emails" -> TokenTypeSink(Analyzers.Email)))
    def terms(sink: String) =
      out.collect { case (s, _, t) if s == sink => t.term }
    assert(terms("dates") == Vector("2025-01-02", "2025-02-03"))
    assert(terms("first3") == Vector("meeting", "2025-01-02",
      "bob@example.com"))
    assert(terms("emails") == Vector("bob@example.com"))
    // ordinals are the consumed-token count, shared across sinks
    assert(out.collect { case ("dates", o, _) => o } == Vector(1, 6))
    // a token can land in several sinks (the tee, not a partition)
    assert(out.count(_._3.term == "2025-01-02") == 2)
    // stream ordinals count SURVIVING tokens: with a stopword ahead,
    // ordinals shift (the sink sits after the stop filter)
    val shifted = tee("the " + text, Seq("first3" -> TokenRangeSink(0, 3)))
    assert(shifted.map(_._3.term) == Vector("meeting", "2025-01-02",
      "bob@example.com"))
    // STRICT resolution: calendar-invalid strings are NOT dates
    val bad = tee("2025-02-30 2025-04-31 2025-02-28",
      Seq("dates" -> DateSink()))
    assert(bad.map(_._3.term) == Vector("2025-02-28"))
  }
}
